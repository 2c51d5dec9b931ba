"""Bisect the backward-Euler TPU worker fault (>=77k 2D elements) by
compiling+running each constituent of the BE Newton step separately at
Monitor1160 size. Round-3/4 observations: the full program faults with
BOTH jax.scipy bicgstab (nested while) and ops.krylov (fixed-trip fori),
while ADMM runs fine at 3x the element count — so the suspect set is
{jvp-of-gradient, krylov-on-jvp, newton-while, scan-nesting}.

Usage: python scripts/tpu_be_probe.py [stage ...]
Stages: grad jvp cgstab newton1 step scan2
Each stage prints PASS/time or the process dies at the faulting stage.
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

from mmadmm_tpu.ops import krylov
from mmadmm_tpu.ops.reductions import block_sum_f64

name = "Monitor1160"
stages = sys.argv[1:] or ["grad", "jvp", "cgstab", "newton1", "step", "scan2"]

cfg = load_experiment_config(
    f"/root/reference/Experiments/InputFiles/{name}.json"
)
cfg.method = 2
cfg.dtype = "float32"
mesh, integ = build_problem(cfg)
print(f"NF={mesh.n_elements} NP={mesh.n_pnts}", flush=True)

F, xi, grid, masks = integ._args
dt_tau = integ.dt / mesh.tau
x0 = mesh.X0


def grad_i(xv):
    _, g = mesh._gradient_impl(xv, F, xi, grid, masks, True)
    return g


def residual(xv, xn):
    return dt_tau * grad_i(xv) + (xv - xn)


def timed(tag, fn, *args):
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    t1 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    t2 = time.perf_counter()
    print(f"PASS {tag}: compile+run {t1 - t0:.1f}s, warm {t2 - t1:.3f}s",
          flush=True)
    return out


if "grad" in stages:
    timed("grad", jax.jit(grad_i), x0)

if "jvp" in stages:
    def jvp_once(xv, v):
        return jax.jvp(lambda y: residual(y, x0), (xv,), (v,))[1]

    timed("jvp", jax.jit(jvp_once), x0, jnp.ones_like(x0))

if "cgstab" in stages:
    def solve(xv, b):
        def mv(v):
            return jax.jvp(lambda y: residual(y, xv), (xv,), (v,))[1]

        dx, info = krylov.bicgstab(mv, b, tol=1e-6, maxiter=40)
        return dx, info

    b = -jax.jit(residual)(x0 - dt_tau * jax.jit(grad_i)(x0), x0)
    dx, (iters, rn) = timed("cgstab", jax.jit(solve), x0, b)
    print(f"  cgstab iters={int(iters)} rnorm2={float(rn):.3e}", flush=True)

if "newton1" in stages:
    # ONE Newton iteration, no outer while_loop
    def newton_iter(xv, xn):
        Fv = residual(xv, xn)
        gnorm = block_sum_f64(jnp.abs(Fv))

        def mv(v):
            return jax.jvp(lambda y: residual(y, xn), (xv,), (v,))[1]

        dx, _ = krylov.bicgstab(mv, -Fv, tol=1e-6, maxiter=40)
        return xv + dx, gnorm

    xg = x0 - dt_tau * jax.jit(grad_i)(x0)
    (x1, gn) = timed("newton1", jax.jit(newton_iter), xg, x0)
    print(f"  gnorm={float(gn):.3e}", flush=True)

if "gradw" in stages:
    # MINIMAL while: Newton-shaped loop, body = gradient assembly + f64
    # block sum + damped step; NO krylov, NO hessian. Isolates
    # while(gather+energy-grad+scatter+blocksum) at this size.
    def gradw(x):
        xn = x

        def cond(c):
            it, _, gn = c
            return jnp.logical_and(it < 5, gn >= 1e-10)

        def body(c):
            it, xv, _ = c
            Fv = residual(xv, xn)
            gn = block_sum_f64(jnp.abs(Fv))
            return it + 1, xv - 0.5 * Fv, gn

        it, xv, gn = jax.lax.while_loop(
            cond, body, (jnp.int32(0), x, jnp.asarray(jnp.inf, jnp.float64))
        )
        return xv, gn

    _, gn = timed("gradw", jax.jit(gradw), x0)
    print(f"  gnorm={float(gn):.3e}", flush=True)

if "hess1" in stages:
    # one Newton iteration: jacfwd-analytic element Hessians + UNROLLED
    # cgstab(8) on the explicit matvec — NO while anywhere
    from mmadmm_tpu.ops import huang
    from mmadmm_tpu.ops.monitor_grid import gather_cell
    from mmadmm_tpu.ops.scatter import gather_elements, scatter_add_dense

    dim = mesh.dim
    dp1 = dim + 1
    n = dim * dp1
    ehat, cm = mesh.ehat, mesh.comp_mesh
    elem_free, interior_nodes, dense_idx = masks
    gather_cells = jax.vmap(
        jax.vmap(gather_cell, in_axes=(None, 0)), in_axes=(None, 0)
    )

    def elem_hess(xv):
        z = gather_elements(xv, F)
        cells = gather_cells(grid, z)

        def h_one(zf, xi_e, cells_e):
            return jax.jacfwd(
                lambda q: huang.element_energy_grad(
                    q.reshape(dp1, dim), xi_e, None, ehat, cm,
                    cells=cells_e,
                )[1].reshape(n)
            )(zf)

        return jax.vmap(h_one)(z.reshape(-1, n), xi, cells)

    def hess1(x):
        xn = x
        xv = x - dt_tau * grad_i(x)
        Fv = residual(xv, xn)
        He = elem_hess(xv)

        def mv(v):
            ve = gather_elements(v, F).reshape(-1, n)
            hv = jnp.sum(He * ve[:, None, :], axis=2)
            out = scatter_add_dense(hv.reshape(-1, dp1, dim), dense_idx)
            return v + dt_tau * (out * interior_nodes)

        dx, (iters, rn) = krylov.bicgstab(
            mv, -Fv, tol=1e-6, maxiter=8, unroll=True
        )
        return xv + dx, iters, rn

    _, its, rn = timed("hess1", jax.jit(hess1), x0)
    print(f"  iters={int(its)} rnorm2={float(rn):.3e}", flush=True)

if "step" in stages:
    timed("step", lambda x: integ._step_jit(x, *integ._args)[0], x0)

if "scan2" in stages:
    s = integ.init_state()
    timed("scan2", lambda: integ.multi_step(s, 2)[0].x)

print("ALL DONE", flush=True)
