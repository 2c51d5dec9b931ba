"""Prox z-update timing on the current backend (vmap/XLA).

Builds a production-size problem (default Monitor1320, 307k triangles),
runs two chunked steps to get a realistic mid-run state, then times one
prox call at the ADMM settings. Uses the persistent compile cache, so run
after bench.py has warmed the step program.

History: through round 2 this script compared the vmapped solver against
a fused Pallas SoA kernel. The kernel NEVER compiled on real hardware —
Mosaic rejects the leading-dim shape casts the matrix-form element math
requires ("infer-vector-layout: unsupported shape cast",
vector<128x8x6xf32> -> vector<128x8x3x2xf32> at prox.py's
z_flat.reshape) — and was removed; the recorded numbers and the decision
live in COVERAGE.md ("Prox backend decision").
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
tol = integ.prox_tol
iters = integ.prox_max_iters


def _sync(r):
    """block_until_ready is not a reliable fence on the axon backend —
    force a one-element host readback, which must wait for the program."""
    leaf = jax.tree_util.tree_leaves(r)[0]
    return jax.device_get(leaf.ravel()[:1])


f = jax.jit(mesh.prox_fn, static_argnums=(5, 6))
t0 = time.perf_counter()
out = f(mesh.grid, z, mesh.xi, dxpu, mesh.elem_free, tol, iters)
_sync(out)
compile_s = time.perf_counter() - t0
n = 10
t0 = time.perf_counter()
for _ in range(n):
    out = f(mesh.grid, z, mesh.xi, dxpu, mesh.elem_free, tol, iters)
_sync(out)  # one readback fences the whole enqueued stream
steady_ms = (time.perf_counter() - t0) / n * 1e3
z_out, ih0 = out
ok = bool(jnp.all(jnp.isfinite(z_out))) and bool(jnp.isfinite(ih0).all())
print(
    f"vmap     compile+first={compile_s:7.2f}s "
    f"steady={steady_ms:8.2f} ms  ih0_sum={float(jnp.sum(ih0)):.8f}",
    flush=True,
)
print(f"PROX_BENCH_RESULT {'OK' if ok else 'NONFINITE'}", flush=True)
