"""Probe remote-TPU compile times of the step program's building blocks.

The full ADMM step is only ~6k StableHLO lines yet compiles for tens of
minutes through the remote compile service; this isolates which construct
is pathological: f64-emulation, while_loop nesting, the prox cond, or
just per-RPC latency. Run with a SMALL config so array sizes are not the
variable. Usage: python scripts/tpu_compile_probe.py [config] [dtype]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from mmadmm_tpu.config import load_experiment_config
from mmadmm_tpu.problems import build_problem
from mmadmm_tpu.runtime.cache import enable_persistent_cache

name = sys.argv[1] if len(sys.argv) > 1 else "Monitor120"
dtype = sys.argv[2] if len(sys.argv) > 2 else "float32"
if len(sys.argv) > 3 and sys.argv[3] == "cached":
    enable_persistent_cache()

cfg = load_experiment_config(
    f"/root/reference/Experiments/InputFiles/{name}.json"
)
cfg.dtype = dtype
mesh, integ = build_problem(cfg)
print(f"{name} NF={mesh.n_elements} dtype={dtype}", flush=True)

state = integ.init_state()
x = state.x
z = mesh.gather(x)
dxpu = z


def probe(label, fn, *args):
    t0 = time.perf_counter()
    compiled = jax.jit(fn).lower(*args).compile()
    t1 = time.perf_counter()
    r = compiled(*args)
    jax.block_until_ready(r)
    t2 = time.perf_counter()
    print(
        f"  {label:38s} compile {t1-t0:8.1f} s   run {(t2-t1)*1e3:8.1f} ms",
        flush=True,
    )


from mmadmm_tpu.ops.reductions import block_sum_f64
from mmadmm_tpu.ops.scatter import gather_elements, scatter_add_dense

probe("trivial add", lambda a: a + 1.0, x)
probe("gather x[F]", gather_elements, x, mesh.F)
probe("scatter_add dense", scatter_add_dense, z, mesh.dense_idx)
probe("block_sum_f64", block_sum_f64, z)
probe(
    "energy+grad batch",
    lambda zz, xi, g: mesh._energy_grad_e(zz, xi, g),
    z, mesh.xi, mesh.grid,
)
probe(
    "while_loop 50x (toy)",
    lambda a: jax.lax.while_loop(
        lambda c: c[0] < 50, lambda c: (c[0] + 1, c[1] * 0.99 + 1.0), (0, a)
    )[1],
    x,
)
probe(
    "prox (full while+cond)",
    lambda g, zz, xi, dd, fm: mesh.prox_fn(g, zz, xi, dd, fm, 1e-5, 50),
    mesh.grid, z, mesh.xi, dxpu, mesh.elem_free,
)
probe("one ADMM step", integ.step_fn, state, integ.consts)
