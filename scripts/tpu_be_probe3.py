"""BE while-loop fault, round 3: the body content that poisons a
lax.while_loop at Monitor1160 size. Facts so far (tpu_be_probe.py):

  PASS  while(grad + f64 blocksum + damped step)          [gradw]
  PASS  grad + He(jacfwd) + unrolled cgstab(8), NO while  [hess1]
  FAULT while(grad + He + unrolled cgstab(8))             [step]

Stages here (run in order; the process dies at the faulting one):
  hessw — while(grad + He build + He-diagonal damped step): Hessian
          build inside the while, no Krylov machinery.
  kryw  — while(grad + unrolled cgstab(8) on a TRIVIAL matvec): Krylov
          machinery (f64 dots, safe-div scalars, masked updates) inside
          the while, no Hessian.
  neumw — while(grad + He + 8-term Neumann-series solve): the candidate
          fix — pure matvec polynomial, no dots/scalars in the solve.
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

from mmadmm_tpu.ops import huang, krylov
from mmadmm_tpu.ops.monitor_grid import gather_cell
from mmadmm_tpu.ops.reductions import block_sum_f64
from mmadmm_tpu.ops.scatter import gather_elements, scatter_add_dense

name = "Monitor1160"
stages = sys.argv[1:] or ["hessw", "kryw", "neumw"]

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


def timed(tag, fn, *args):
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    t1 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    t2 = time.perf_counter()
    print(f"PASS {tag}: compile+run {t1 - t0:.1f}s, warm {t2 - t1:.3f}s",
          flush=True)
    return out


def newton_while(solve):
    """while(grad + solve(He?, Fv)); 4 iterations max."""

    def run(x):
        xn = x

        def cond(c):
            it, _, gn = c
            return jnp.logical_and(it < 4, gn >= 1e-4)

        def body(c):
            it, xv, _ = c
            Fv = residual(xv, xn)
            gn = block_sum_f64(jnp.abs(Fv))
            dx = solve(xv, Fv)
            return it + 1, xv + dx, gn

        it, xv, gn = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), x - dt_tau * grad_i(x),
             jnp.asarray(jnp.inf, jnp.float64)),
        )
        return xv, gn

    return run


if "hessw" in stages:
    def solve_hdiag(xv, Fv):
        He = elem_hess(xv)
        d_e = jnp.diagonal(He, axis1=1, axis2=2)
        d = scatter_add_dense(
            d_e.reshape(-1, dp1, dim), dense_idx
        ) * interior_nodes
        return -Fv / (1.0 + dt_tau * d)

    _, gn = timed("hessw", jax.jit(newton_while(solve_hdiag)), x0)
    print(f"  gnorm={float(gn):.3e}", flush=True)

if "kryw" in stages:
    def solve_trivial_krylov(xv, Fv):
        dx, _ = krylov.bicgstab(
            lambda v: v + dt_tau * v, -Fv, tol=1e-6, maxiter=8, unroll=True
        )
        return dx

    _, gn = timed("kryw", jax.jit(newton_while(solve_trivial_krylov)), x0)
    print(f"  gnorm={float(gn):.3e}", flush=True)

if "neumw" in stages:
    def solve_neumann(xv, Fv):
        He = elem_hess(xv)
        mv = matvec_from(He)
        # J = I + A; J^-1 b = sum_k (-A)^k b. A b = mv(b) - b.
        b = -Fv
        term = b
        acc = b
        for _ in range(8):
            term = -(mv(term) - term)
            acc = acc + term
        return acc

    _, gn = timed("neumw", jax.jit(newton_while(solve_neumann)), x0)
    print(f"  gnorm={float(gn):.3e}", flush=True)

print("ALL DONE", flush=True)
