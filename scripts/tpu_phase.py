"""Phase-level timing of one ADMM step on the current backend.

Separates: gather, scatter-add, f64 energy reduction, batched
energy+grad, prox at max_iters in {1, 5, 50}. Every probe passes the mesh
arrays as ARGUMENTS (closing over them embeds multi-MB HLO constants,
which makes the remote TPU compile of each probe take tens of minutes —
same rationale as ADMMIntegrator._consts).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax

from mmadmm_tpu.config import load_experiment_config
from mmadmm_tpu.problems import build_problem
from mmadmm_tpu.runtime.cache import enable_persistent_cache

enable_persistent_cache()

name = sys.argv[1] if len(sys.argv) > 1 else "Monitor180"
dtype = sys.argv[2] if len(sys.argv) > 2 else "float32"

cfg = load_experiment_config(f"/root/reference/Experiments/InputFiles/{name}.json")
cfg.dtype = dtype
mesh, integ = build_problem(cfg)
print(f"{name} NF={mesh.n_elements} NP={mesh.n_pnts} dtype={dtype}", flush=True)

from mmadmm_tpu.ops.scatter import gather_elements, scatter_add_dense  # noqa: E402

state = integ.init_state()
state, _ = integ.step(state)  # compile + get a realistic mid-run state
state, _ = integ.step(state)
x = state.x
z = gather_elements(x, mesh.F)
dxpu = z + state.u_bar


def _sync(r):
    """block_until_ready is NOT a reliable fence on the axon backend
    (measured: 0.05 ms for a 73 MB gather) — force a host readback of one
    element, which cannot complete before the producing program does."""
    leaf = jax.tree_util.tree_leaves(r)[0]
    np_leaf = jax.device_get(leaf.ravel()[:1] if leaf.ndim else leaf)
    return np_leaf


def timeit(label, fn, *args, n=20):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    r = f(*args)
    _sync(r)
    print(f"  {label:34s} compile+1 {time.perf_counter()-t0:7.1f} s",
          flush=True)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    _sync(r)  # one readback fences the whole enqueued stream
    dt = (time.perf_counter() - t0) / n
    print(f"  {label:34s} {dt*1e3:9.2f} ms", flush=True)
    return dt


timeit("gather x[F]", gather_elements, x, mesh.F)
timeit("scatter_add (dense plan)", scatter_add_dense, z, mesh.dense_idx)
timeit(
    "energy+grad batch (no scatter)",
    lambda zz, xi, grid: mesh._energy_grad_e(zz, xi, grid),
    z, mesh.xi, mesh.grid,
)
timeit(
    "full gradient (grad+scatter)",
    lambda xv, F, xi, grid, masks: mesh._gradient_impl(
        xv, F, xi, grid, masks, False
    ),
    x, mesh.F, mesh.xi, mesh.grid,
    (mesh.elem_free, mesh.interior_nodes, mesh.dense_idx),
)
for k in (1, 5, 50):
    timeit(
        f"prox max_iters={k}",
        lambda gg, zz, xi, dd, free, kk=k: mesh.prox_fn(
            gg, zz, xi, dd, free, integ.prox_tol, kk
        ),
        mesh.grid, z, mesh.xi, dxpu, mesh.elem_free,
        n=5,
    )
t0 = time.perf_counter()
for _ in range(5):
    state, info = integ.step(state)
_sync(state.x)
print(f"  full step                         {(time.perf_counter()-t0)/5*1e3:9.2f} ms", flush=True)
print("  admm iters last:", int(info.n_iters), flush=True)
