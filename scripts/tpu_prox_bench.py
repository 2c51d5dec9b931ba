"""Prox backend shootout on the current backend: vmap vs Pallas kernel.

Builds a production-size problem (default Monitor1320, 307k triangles),
runs two steps to get a realistic mid-run state, then times one prox call
(z-update) per backend at the ADMM settings. Uses the persistent compile
cache, so run after bench.py has warmed the step program.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from mmadmm_tpu.config import load_experiment_config
from mmadmm_tpu.problems import build_problem
from mmadmm_tpu.runtime.cache import enable_persistent_cache

enable_persistent_cache()

name = sys.argv[1] if len(sys.argv) > 1 else "Monitor1320"
cfg = load_experiment_config(
    f"/root/reference/Experiments/InputFiles/{name}.json"
)
cfg.dtype = "float32"
mesh, integ = build_problem(cfg)
print(f"{name} NF={mesh.n_elements} NP={mesh.n_pnts}", flush=True)

state = integ.init_state()
# chunked program is what bench.py compiles -> persistent-cache hit
state, _ = integ.multi_step(state, 8)
jax.block_until_ready(state.x)
z = mesh.gather(state.x)
dxpu = z + state.u_bar
tol = integ.tol / 100.0
iters = integ.prox_max_iters

from mmadmm_tpu.ops.prox_pallas import make_prox_pallas

pp = make_prox_pallas(mesh.ehat, mesh.comp_mesh, mesh.w, mesh.dim)
backends = {"vmap": mesh.prox_fn, "pallas": pp}

def _sync(r):
    """block_until_ready is not a reliable fence on the axon backend —
    force a one-element host readback, which must wait for the program."""
    leaf = jax.tree_util.tree_leaves(r)[0]
    return jax.device_get(leaf.ravel()[:1])


for label, fn in backends.items():
    f = jax.jit(fn, static_argnums=(5, 6))
    t0 = time.perf_counter()
    out = f(mesh.grid, z, mesh.xi, dxpu, mesh.elem_free, tol, iters)
    _sync(out)
    compile_s = time.perf_counter() - t0
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(mesh.grid, z, mesh.xi, dxpu, mesh.elem_free, tol, iters)
    _sync(out)  # one readback fences the whole enqueued stream
    times = [(time.perf_counter() - t0) / n]
    z_out, ih0 = out
    print(
        f"{label:8s} compile+first={compile_s:7.2f}s "
        f"steady={min(times)*1e3:8.2f} ms  ih0_sum={float(jnp.sum(ih0)):.8f}",
        flush=True,
    )
    if label == "vmap":
        z_ref, ih_ref = out

import numpy as np

zdiff = float(jnp.max(jnp.abs(z_out - z_ref)))
ihdiff = float(jnp.max(jnp.abs(ih0 - ih_ref)))
print(f"max |z_pallas - z_vmap| = {zdiff}  max |ih diff| = {ihdiff}")
# parseable verdict for tests/test_prox_pallas.py::test_pallas_on_tpu
ok = zdiff < 1e-5 and ihdiff < 1e-5 and np.isfinite(zdiff)
print(f"PROX_BENCH_RESULT {'OK' if ok else 'MISMATCH'}", flush=True)
