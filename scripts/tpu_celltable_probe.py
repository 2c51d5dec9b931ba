"""Microbenchmark: cell-table gather variants on TPU.

The frozen-cell monitor gather ([NF*(D+1)] random rows from the
[ny*nx, 20] cell table) is the dominant fixed cost of a prox call at
production scale (~27 ms of a 39 ms 1-iteration prox on Monitor1320).
This probe measures how that cost scales with row WIDTH (20 -> 12 -> 8
-> 4 f32) and index LOCALITY (RCB-ordered real ids vs random vs sorted)
to decide whether shrinking the row (symmetric-monitor compression +
computing cell bounds from the id instead of storing them) is worth it.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

NROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 409_600  # 640x640 cells
NIDX = int(sys.argv[2]) if len(sys.argv) > 2 else 921_600  # NF*(D+1)

rng = np.random.default_rng(0)
ids_rand = jnp.asarray(rng.integers(0, NROWS, size=NIDX).astype(np.int32))
ids_sort = jnp.sort(ids_rand)

# realistic ids: from the actual Monitor1320 mesh (RCB element order)
try:
    from mmadmm_tpu.config import load_experiment_config
    from mmadmm_tpu.problems import build_problem
    from mmadmm_tpu.ops.monitor_grid import _cell_index

    cfg = load_experiment_config(
        "/root/reference/Experiments/InputFiles/Monitor1320.json"
    )
    cfg.dtype = "float32"
    mesh, integ = build_problem(cfg)
    from mmadmm_tpu.ops.scatter import gather_elements

    z = gather_elements(mesh.X0, mesh.F)  # [NF, 3, 2]
    ax, ay = mesh.grid.axes
    nx = ax.shape[0] - 1
    xi = jax.vmap(jax.vmap(lambda p: _cell_index(p[0], ax)))(z)
    yi = jax.vmap(jax.vmap(lambda p: _cell_index(p[1], ay)))(z)
    ids_real = (yi * nx + xi).reshape(-1).astype(jnp.int32)
    print(f"real ids from Monitor1320: {ids_real.shape[0]} idx, "
          f"table {mesh.grid.cell_table.shape}", flush=True)
except Exception as e:  # noqa: BLE001
    print(f"(no real mesh ids: {e!r})", flush=True)
    ids_real = None


def _sync(r):
    """block_until_ready is not a reliable fence on the axon backend —
    force a one-element host readback, which must wait for the program."""
    leaf = jax.tree_util.tree_leaves(r)[0]
    return jax.device_get(leaf.ravel()[:1])


def timeit(label, fn, *args, n=30):
    f = jax.jit(fn)
    r = f(*args)
    _sync(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    _sync(r)  # one readback fences the whole enqueued stream
    print(f"  {label:46s} {(time.perf_counter()-t0)/n*1e3:8.2f} ms",
          flush=True)


# sanity: bf16 matmul with known FLOPs to validate the fence
A = jnp.asarray(rng.standard_normal((4096, 4096)), dtype=jnp.bfloat16)
timeit("sanity bf16 4096^3 matmul (0.14 TFLOP)",
       lambda a: a @ a, A)


for width in (20, 12, 8, 4, 2):
    tbl = jnp.asarray(
        rng.standard_normal((NROWS, width)).astype(np.float32)
    )
    timeit(f"[{NROWS},{width}] rows, random ids", lambda t, i: t[i],
           tbl, ids_rand)
    timeit(f"[{NROWS},{width}] rows, sorted ids", lambda t, i: t[i],
           tbl, ids_sort)
    if ids_real is not None:
        timeit(f"[{NROWS},{width}] rows, real RCB ids", lambda t, i: t[i],
               tbl, ids_real)

# wide-row table as 2 half-width gathers (tests tile-granularity theory)
tbl20 = jnp.asarray(rng.standard_normal((NROWS, 20)).astype(np.float32))
tbl10a = tbl20[:, :10]
tbl10b = tbl20[:, 10:]
timeit(
    "2x [.,10] gathers, random ids",
    lambda a, b, i: (a[i], b[i]),
    tbl10a, tbl10b, ids_rand,
)
# one-hot matmul alternative (MXU): out = onehot(ids) @ table — NIDX x NROWS
# is too big; skipped.
