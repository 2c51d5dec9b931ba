"""Phase-level timing of one ADMM step on the current backend.

Separates: gather, scatter-add (segment_sum), f64 energy reduction,
batched energy+grad, prox at max_iters in {1, 5, 50}. Run on TPU to find
the per-step bottleneck; on CPU for comparison.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from mmadmm_tpu.config import load_experiment_config
from mmadmm_tpu.problems import build_problem

name = sys.argv[1] if len(sys.argv) > 1 else "Monitor180"
dtype = sys.argv[2] if len(sys.argv) > 2 else "float32"

cfg = load_experiment_config(f"/root/reference/Experiments/InputFiles/{name}.json")
cfg.dtype = dtype
mesh, integ = build_problem(cfg)
print(f"{name} NF={mesh.n_elements} NP={mesh.n_pnts} dtype={dtype}", flush=True)

state = integ.init_state()
state, _ = integ.step(state)  # compile + get a realistic mid-run state
state, _ = integ.step(state)
x = state.x
z = mesh.gather(x)
u = state.u_bar
dxpu = z + u


def timeit(label, fn, *args, n=20):
    f = jax.jit(fn)
    r = f(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / n
    print(f"  {label:34s} {dt*1e3:9.2f} ms", flush=True)
    return dt


timeit("gather x[F]", lambda xv: mesh.gather(xv), x)
timeit("scatter_add (dense plan)", lambda v: mesh.scatter_add(v), z)
timeit("f64 elem-energy sum", lambda zz: mesh.energy_of_z(zz), z)
timeit(
    "energy+grad batch (no scatter)",
    lambda zz: mesh._energy_grad_e(zz, mesh.xi, mesh.grid),
    z,
)
timeit(
    "full gradient (grad+scatter)",
    lambda xv: mesh._gradient_impl(
        xv, mesh.F, mesh.xi, mesh.grid,
        (mesh.elem_free, mesh.interior_nodes, mesh.dense_idx), False,
    ),
    x,
)
for k in (1, 5, 50):
    timeit(
        f"prox max_iters={k}",
        lambda gg, zz, dd, kk=k: mesh.prox_fn(
            gg, zz, mesh.xi, dd, mesh.elem_free, integ.tol / 100.0, kk
        ),
        mesh.grid,
        z,
        dxpu,
        n=5,
    )
t0 = time.perf_counter()
for _ in range(5):
    state, info = integ.step(state)
jax.block_until_ready(state.x)
print(f"  full step                         {(time.perf_counter()-t0)/5*1e3:9.2f} ms", flush=True)
print("  admm iters last:", int(info.n_iters), flush=True)
