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


# --- round 4: the component-form Pallas kernel A/B ---------------------
# (ops/prox_pallas2d.py — one (8,128) vreg per tensor entry, no shape
# casts; the fix the round-3 post-mortem identified. VERDICT r3 item 5's
# "done" bar: a measured win OR a recorded on-chip measurement.)
ok2d = (
    mesh.dim == 2 and not mesh.comp_mesh
    and mesh.grid.cell_table is not None
    and not mesh.grid.constant
    and mesh.grid.cell_table.shape[-1] == 16
)
ok3d = (
    mesh.dim == 3 and not mesh.comp_mesh
    and (mesh.grid.constant
         or (mesh.grid.cell_table is not None
             and mesh.grid.cell_table.shape[-1] == 48))
)
if ok2d or ok3d:
    if ok2d:
        from mmadmm_tpu.ops.prox_pallas2d import make_prox_pallas2d as mk
    else:
        from mmadmm_tpu.ops.prox_pallas3d import make_prox_pallas3d as mk

    pf = jax.jit(mk(mesh.ehat, mesh.w), static_argnums=(5, 6))
    t0 = time.perf_counter()
    out_p = pf(mesh.grid, z, mesh.xi, dxpu, mesh.elem_free, tol, iters)
    _sync(out_p)
    compile_p = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        out_p = pf(mesh.grid, z, mesh.xi, dxpu, mesh.elem_free, tol, iters)
    _sync(out_p)
    steady_p = (time.perf_counter() - t0) / n * 1e3
    zp, ih0p = out_p
    okp = bool(jnp.all(jnp.isfinite(zp))) and bool(jnp.isfinite(ih0p).all())

    # quality: both backends minimize the same strongly-convex
    # subproblems — compare the optimized REGULARIZED energies
    def reg_energy(zz):
        e = mesh._energy_e(zz, mesh.xi, mesh.grid)
        return jnp.sum(
            e.astype(jnp.float64)
            + 0.5 * mesh.w**2
            * jnp.sum((dxpu - zz) ** 2, axis=(1, 2)).astype(jnp.float64)
        )

    e_v = float(reg_energy(z_out))
    e_p = float(reg_energy(zp))
    dih = float(jnp.max(jnp.abs(ih0p - ih0)))
    print(
        f"pallas   compile+first={compile_p:7.2f}s "
        f"steady={steady_p:8.2f} ms  ih0_sum={float(jnp.sum(ih0p)):.8f}",
        flush=True,
    )
    print(
        f"quality: reg-energy vmap={e_v:.9f} pallas={e_p:.9f} "
        f"(pallas-vmap={e_p - e_v:+.3e}); max|ih0 diff|={dih:.3e}",
        flush=True,
    )
    print(
        f"PROX_AB_RESULT {'OK' if okp else 'NONFINITE'} "
        f"vmap_ms={steady_ms:.2f} pallas_ms={steady_p:.2f} "
        f"speedup={steady_ms / steady_p:.2f}x",
        flush=True,
    )
