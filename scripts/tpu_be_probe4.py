"""BE while-loop fault, round 4: binary split between probe3's PASSING
while(grad + He + Neumann polynomial) and the FAULTING real step.

  R1: real inner solve (Jacobi dvec + Richardson polynomial + residual
      safeguard) inside the probe's simple Newton while (no masked
      update, cap 4).
  R2: probe's raw-Neumann solve inside the REAL Newton body (masked
      update, finite-min test, cap 1000, post-loop energy eval).
  R3: the integrator's own step program (expected FAULT, reproduction).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from mmadmm_tpu.config import load_experiment_config
from mmadmm_tpu.problems import build_problem
from mmadmm_tpu.runtime.cache import enable_persistent_cache

enable_persistent_cache()
import jax
import jax.numpy as jnp

from mmadmm_tpu.ops import huang
from mmadmm_tpu.ops.monitor_grid import gather_cell
from mmadmm_tpu.ops.reductions import block_sum_f64
from mmadmm_tpu.ops.scatter import gather_elements, scatter_add_dense

name = "Monitor1160"
stages = sys.argv[1:] or ["R1", "R2", "R3"]

cfg = load_experiment_config(
    f"/root/reference/Experiments/InputFiles/{name}.json"
)
cfg.method = 2
cfg.dtype = "float32"
mesh, integ = build_problem(cfg)
print(f"NF={mesh.n_elements} NP={mesh.n_pnts}", flush=True)

F, xi, grid, masks = integ._args
elem_free, interior_nodes, dense_idx = masks
dt_tau = integ.dt / mesh.tau
x0 = mesh.X0
dim = mesh.dim
dp1 = dim + 1
n = dim * dp1
ehat, cm = mesh.ehat, mesh.comp_mesh
gather_cells = jax.vmap(
    jax.vmap(gather_cell, in_axes=(None, 0)), in_axes=(None, 0)
)


def grad_i(xv):
    _, g = mesh._gradient_impl(xv, F, xi, grid, masks, True)
    return g


def residual(xv, xn):
    return dt_tau * grad_i(xv) + (xv - xn)


def elem_hess(xv):
    z = gather_elements(xv, F)
    cells = gather_cells(grid, z)

    def h_one(zf, xi_e, cells_e):
        return jax.jacfwd(
            lambda q: huang.element_energy_grad(
                q.reshape(dp1, dim), xi_e, None, ehat, cm, cells=cells_e
            )[1].reshape(n)
        )(zf)

    return jax.vmap(h_one)(z.reshape(-1, n), xi, cells)


def matvec_from(He):
    def mv(v):
        ve = gather_elements(v, F).reshape(-1, n)
        hv = jnp.sum(He * ve[:, None, :], axis=2)
        out = scatter_add_dense(hv.reshape(-1, dp1, dim), dense_idx)
        return v + dt_tau * (out * interior_nodes)

    return mv


def solve_raw_neumann(xv, Fv):
    He = elem_hess(xv)
    mv = matvec_from(He)
    b = -Fv
    term = b
    acc = b
    for _ in range(8):
        term = -(mv(term) - term)
        acc = acc + term
    return acc


def solve_real(xv, Fv):
    He = elem_hess(xv)
    mv = matvec_from(He)
    d_e = jnp.diagonal(He, axis1=1, axis2=2)
    dvec = 1.0 + dt_tau * (
        scatter_add_dense(d_e.reshape(-1, dp1, dim), dense_idx)
        * interior_nodes
    )
    b = -Fv
    dx = b / dvec
    for _ in range(10):
        dx = dx + (b - mv(dx)) / dvec
    rnorm = block_sum_f64(jnp.abs(b - mv(dx)))
    bnorm = block_sum_f64(jnp.abs(b))
    return jnp.where(rnorm <= bnorm, dx, b / dvec)


def timed(tag, fn, *args):
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    t1 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    t2 = time.perf_counter()
    print(f"PASS {tag}: compile+run {t1 - t0:.1f}s, warm {t2 - t1:.3f}s",
          flush=True)
    return out


if "R1" in stages:
    def r1(x):
        xn = x

        def cond(c):
            it, _, gn = c
            return jnp.logical_and(it < 4, gn >= 1e-4)

        def body(c):
            it, xv, _ = c
            Fv = residual(xv, xn)
            gn = block_sum_f64(jnp.abs(Fv))
            dx = solve_real(xv, Fv)
            return it + 1, xv + dx, gn

        return jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), x - dt_tau * grad_i(x),
             jnp.asarray(jnp.inf, jnp.float64)),
        )[1:]

    _, gn = timed("R1", jax.jit(r1), x0)
    print(f"  gnorm={float(gn):.3e}", flush=True)

if "R2" in stages:
    safety_tol = 0.1 * integ.tol

    def r2(x):
        xn = x
        xg = x - dt_tau * grad_i(x)

        def cond(c):
            it, _, gnorm, _ = c
            return jnp.logical_and(it < 1000, gnorm >= safety_tol)

        def body(c):
            it, xv, _, _ = c
            Fv = residual(xv, xn)
            gnorm = block_sum_f64(jnp.abs(Fv))
            dx = solve_raw_neumann(xv, Fv)
            finite = jnp.min(jnp.isfinite(dx).astype(dx.dtype))
            dx = jnp.where(finite > 0.5, dx, -Fv)
            xv = jnp.where(gnorm >= safety_tol, xv + dx, xv)
            return it + 1, xv, gnorm, gnorm

        F0 = residual(xg, xn)
        g0 = block_sum_f64(jnp.abs(F0))
        it, xv, _, _ = jax.lax.while_loop(
            cond, body, (jnp.zeros((), jnp.int32), xg, g0, jnp.inf)
        )
        ih = mesh._energy_impl(xv, F, xi, grid)
        return xv, ih, it

    _, ih, it = timed("R2", jax.jit(r2), x0)
    print(f"  ih={float(ih):.6f} newton={int(it)}", flush=True)

if "R3" in stages:
    out = timed("R3", lambda x: integ._step_jit(x, *integ._args)[0], x0)

print("ALL DONE", flush=True)
