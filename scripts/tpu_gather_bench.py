"""Micro-benchmarks of the memory-bound ops at production scale (TPU):
element gather, dense scatter-add, monitor-cell gather, cell-index compute.
All probes pass arrays as arguments (no HLO constants)."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from mmadmm_tpu.config import load_experiment_config
from mmadmm_tpu.problems import build_problem
from mmadmm_tpu.runtime.cache import enable_persistent_cache
enable_persistent_cache()

name = sys.argv[1] if len(sys.argv) > 1 else "Monitor1320"
cfg = load_experiment_config(f"/root/reference/Experiments/InputFiles/{name}.json")
cfg.dtype = "float32"
mesh, integ = build_problem(cfg)
print(f"{name} NF={mesh.n_elements}", flush=True)
from mmadmm_tpu.ops.scatter import gather_elements, scatter_add_dense
from mmadmm_tpu.ops.monitor_grid import gather_cell, _cell_index

state = integ.init_state()
state, _ = integ.step(state)
x = state.x
z = gather_elements(x, mesh.F)

gather_cells = jax.vmap(jax.vmap(gather_cell, in_axes=(None, 0)),
                        in_axes=(None, 0))

def timeit(label, fn, *args, n=20):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    r = f(*args); jax.block_until_ready(r)
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / n
    print(f"  {label:30s} {dt*1e3:8.2f} ms  (compile {c:.0f}s)", flush=True)

timeit("gather x[F]", gather_elements, x, mesh.F)
timeit("scatter_add dense", scatter_add_dense, z, mesh.dense_idx)
timeit("gather_cells(grid, z)", gather_cells, mesh.grid, z)
def cell_ids(grid, zz):
    ax, ay = grid.axes
    xi = _cell_index(zz[..., 0], ax)
    yi = _cell_index(zz[..., 1], ay)
    return yi * (ax.shape[0] - 1) + xi

timeit("cell ids (searchsorted)", cell_ids, mesh.grid, z)
# layout variants for the element gather
Ff = mesh.F.reshape(-1)
timeit("take flat rows", lambda xv, ff: jnp.take(xv, ff, axis=0), x, Ff)
xT = x.T.copy()
timeit("take lanes (xT[:, F])", lambda xt, ff: jnp.take(xt, ff, axis=1), xT, Ff)
x8 = jnp.pad(x, ((0, 0), (0, 6)))
timeit("take rows padded to 8", lambda xv, ff: jnp.take(xv, ff, axis=0), x8, Ff)
