"""Backward Euler via matrix-free Newton-Krylov (reference methodType 2).

The reference assembles a finite-difference Jacobian into a custom CSR
matrix and solves with ILU(0)-preconditioned CGSTAB
(``Mesh::backwardsEulerStep``, ``src/Mesh.cpp:1264-1341``;
``buildEulerJac`` :1113-1135; LASolver ``MatrixIter``/``scaler_ILU``/
``scaler_cgstab``). ILU is inherently sequential and hostile to TPUs, so the
TPU-native redesign is matrix-free:

  F(x) = (dt/tau) grad I(x) + (x - x^n)        (Mesh.cpp:1289-1293)

Newton with *exact* Jacobian-vector products through EXPLICIT per-element
Hessians ``He [NF, n, n]`` of the Huang energy (jacfwd of the analytic
gradient, frozen interpolation cells — the ADMM prox's proven structure):
``J v = v + dt/tau * interior_mask * scatter(He @ gather(v))``, a pure
gather/VPU-multiply/scatter pipeline.

Default inner solve: ``neumann`` — CHORD Jacobi-preconditioned
Richardson (``He``/``D = 1 + dt/tau diag(H)`` built once per step at the
initial guess, the reference's own chord policy, Mesh.cpp:1284;
``dx_{k+1} = dx_k + D^{-1}(b - J dx_k)``, 6 fixed terms, one
residual-norm safeguard). This dot-free shape is what the TPU backend
executes reliably inside the Newton ``lax.while_loop`` at production
sizes — the round-3 "kernel fault at >=77k elements" was bisected
(scripts/tpu_be_probe{,3,4}.py) to (a) Krylov dot-recurrences over real
matvecs inside a while_loop, and (b) the f32 L1 noise floor making the
reference's absolute Newton test unreachable, so the loop ran to its
1000-iteration cap and the minutes-long dispatch was killed by the
tunnel. Fixes: the dot-free solve, a stall-progress stop (exit when
``||F||`` stops decreasing — the f32-representable optimum), and
test-then-step carry. Measured: Monitor1160 m2 68.1 s to reference
quality vs the reference's 75.96 s. ``MMADMM_BE_KRYLOV`` selects
``neumann`` (default) | ``hess`` (unrolled ops.krylov BiCGStab on the
explicit matvec — the exact-solve CPU oracle) | ``cgstab`` | ``cg``
(fori + jax.jvp matvec) | ``scipy`` for A/B. An optional diagonal (Jacobi)
chord preconditioner ``M v = v / (1 + dt/tau * diag(Hess I))`` is
available (``precondition=True``; exact Hessian diagonal assembled from
per-element ``jax.hessian`` diagonals once per step) but is OFF by
default: the system ``I + (dt/tau) Hess`` is a small perturbation of the
identity at the shipped configs (dt/tau <= 0.05), and the measured effect
of Jacobi is negative — 0.71 vs 0.61 s/step on Monitor1160
(``scripts/be_precond_bench.py``); the reference's ILU(0)
(Mesh.cpp:263-304) solves a problem these configs don't have. Stops when
``||F||_1 < 0.1 * tol`` like the reference (SAFETY_FAC, Mesh.cpp:1268,1298),
capped at 1000 Newton iterations (Mesh.cpp:1275).
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..mesh import MovingMesh
from ..ops import krylov
from ..ops.reductions import block_sum_f64


class BackwardEulerState(NamedTuple):
    x: jnp.ndarray


class BackwardEulerIntegrator:
    def __init__(
        self,
        mesh: MovingMesh,
        dt: float,
        *,
        tol: float = 1e-3,
        max_newton: int = 1000,
        krylov_tol: float = 1e-6,
        krylov_maxiter: int | None = None,
        krylov_solver: str | None = None,
        precondition: bool = False,
        device_mesh=None,
    ):
        self.mesh = mesh
        self.device_mesh = device_mesh
        self.dt = float(dt)
        self.tol = float(tol)
        self.max_newton = int(max_newton)
        # Solver selection, shaped by the TPU while-loop fault bisect
        # (scripts/tpu_be_probe{,3}.py at Monitor1160 = 76.8k elements):
        #   FAULT while(He + cgstab-on-real-matvec)   any Krylov variant
        #   PASS  while(He + diag solve)                      [hessw]
        #   PASS  while(cgstab machinery, trivial matvec)     [kryw]
        #   PASS  while(He + Neumann matvec polynomial)       [neumw]
        # i.e. each ingredient alone is fine; f64 dot-recurrences OVER
        # real matvec outputs inside a while_loop kill the worker. The
        # TPU-safe inner solve is therefore dot-free:
        #   neumann (default) — Jacobi-preconditioned Richardson: exact
        #     per-element Hessians, D = 1 + dt/tau*diag(H) scattered,
        #     dx_{k+1} = dx_k + D^-1 (b - J dx_k), K fixed terms, one
        #     final residual-norm safeguard (computed OUTSIDE the
        #     polynomial, the gradw-proven pattern).
        #   hess — unrolled BiCGStab on the explicit-Hessian matvec
        #     (exact inner solve; CPU/small-mesh reference path).
        #   cgstab/cg — ops.krylov fori solvers on a jax.jvp matvec.
        #   scipy — the round-3 jax.scipy solver. All kept for A/B.
        if krylov_solver is None:
            krylov_solver = os.environ.get("MMADMM_BE_KRYLOV", "neumann")
        if krylov_solver not in ("neumann", "hess", "cgstab", "cg",
                                 "scipy"):
            raise ValueError(f"unknown krylov_solver {krylov_solver!r}")
        self.krylov_solver = krylov_solver
        if krylov_maxiter is None:
            # short fixed-term solves: the BE system is a small
            # perturbation of the identity (dt/tau <= 0.1 at the shipped
            # configs; cgstab converges in ~3 iterations, tpu_be_probe
            # rnorm2 1.2e-19); Richardson contracts ~rho(D^-1 A_off) per
            # term, 10 terms measured ample for the 1e-6 class
            # Richardson contraction is ~rho(D^-1 A_off) ~ 3e-2 at the
            # shipped configs (cgstab reached 1e-19 in 3 iterations), so
            # 6 terms give ~1e-9 relative — and each term is a full
            # gather/VPU/scatter pass, the dominant per-step cost at
            # production sizes
            env_terms = os.environ.get("MMADMM_BE_TERMS")
            krylov_maxiter = (
                int(env_terms) if env_terms
                else 6 if krylov_solver == "neumann"
                else 8 if krylov_solver == "hess" else 40
            )

        dt_tau = self.dt / mesh.tau
        safety = 0.1  # SAFETY_FAC (Mesh.cpp:1268)

        # mesh arrays threaded as call arguments (not closure constants —
        # same compile-size rationale as ADMMIntegrator._consts)
        self._args = (
            mesh.F, mesh.xi, mesh.grid,
            (mesh.elem_free, mesh.interior_nodes, mesh.dense_idx),
        )

        from ..ops import huang
        from ..ops.monitor_grid import gather_cell
        from ..ops.scatter import gather_elements, scatter_add_dense

        ehat, cm = mesh.ehat, mesh.comp_mesh
        dp1, dim = mesh.dim + 1, mesh.dim
        n = dp1 * dim
        gather_cells = jax.vmap(
            jax.vmap(gather_cell, in_axes=(None, 0)), in_axes=(None, 0)
        )

        def step(x, F, xi, grid, masks):
            _, interior_nodes, dense_idx = masks

            def grad_i(xv):
                _, g = mesh._gradient_impl(xv, F, xi, grid, masks, True)
                return g

            def residual(xv, xn):
                return dt_tau * grad_i(xv) + (xv - xn)

            def elem_hess(xv):
                """Exact per-element Hessians of the Huang energy at xv,
                interpolation cells frozen at xv (identical linearization
                to jax.jvp of the assembled gradient: cell indices are
                piecewise-constant in position, so their tangent is 0).
                Built as jacfwd of the ANALYTIC gradient — the prox's
                proven jacfwd-in-while structure (ops/prox.py jac_fn); no
                reverse-mode anywhere in the while body."""
                z = gather_elements(xv, F)
                cells = gather_cells(grid, z)

                def g_one(zf, xi_e, cells_e):
                    _, g = huang.element_energy_grad(
                        zf.reshape(dp1, dim), xi_e, None, ehat, cm,
                        cells=cells_e,
                    )
                    return g.reshape(n)

                def h_one(zf, xi_e, cells_e):
                    return jax.jacfwd(
                        lambda q: g_one(q, xi_e, cells_e)
                    )(zf)

                return jax.vmap(h_one)(z.reshape(-1, n), xi, cells)

            def matvec_from(He):
                """J v = v + dt/tau * interior * scatter(He @ gather(v)) —
                the global Hessian is the scatter-sum of the element
                blocks (Dmat structure). The 6x6/12x12 products run as
                VPU multiply-sum (no dot_general: TPU f32 matmuls default
                to bf16 passes)."""

                def mv(v):
                    ve = gather_elements(v, F).reshape(-1, n)
                    hv = jnp.sum(He * ve[:, None, :], axis=2)
                    out = scatter_add_dense(
                        hv.reshape(-1, dp1, dim), dense_idx
                    )
                    return v + dt_tau * (out * interior_nodes)

                return mv

            def jac_diag(xv):
                """diag(J) = 1 + (dt/tau) diag(Hess I), exact: the global
                Hessian is the scatter-sum of per-element Hessians, so its
                diagonal is the scatter-sum of their diagonals. Replaces the
                role of the reference's ILU(0) factor (Mesh.cpp:263-304,
                MatrixIter.cpp:635) with a TPU-friendly Jacobi form."""

                def elem_hdiag(z, xi_e):
                    h = jax.hessian(
                        lambda zf: huang.element_energy(
                            zf.reshape(dp1, dim), xi_e, grid, ehat, cm
                        )
                    )(z.reshape(-1))
                    return jnp.diagonal(h).reshape(dp1, dim)

                d_e = jax.vmap(elem_hdiag)(gather_elements(xv, F), xi)
                d = scatter_add_dense(d_e, dense_idx) * interior_nodes
                dj = 1.0 + dt_tau * d
                # Jacobi preconditioning only needs nonsingularity; keep
                # the sign, floor the magnitude away from zero
                return jnp.where(jnp.abs(dj) < 1e-8, 1.0, dj)

            def newton_solve(xv, xn):
                # CHORD preconditioner: the Jacobi diagonal is assembled
                # once per time step at the initial guess and reused for
                # every Newton iteration — the diagonal drifts little
                # within a step, and re-assembling it per iteration costs
                # more than it saves (measured on Monitor1160:
                # scripts/be_precond_bench.py)
                dj = jac_diag(xv) if precondition else None

                # CHORD Jacobian for the neumann path: He and the Jacobi
                # diagonal are built ONCE per time step at the initial
                # guess and reused across Newton iterations — exactly the
                # reference's policy (buildEulerJac at the initial guess,
                # Mesh.cpp:1284, re-assembled only on slow progress —
                # which for us is the stall stop's exit). Halves the
                # per-step cost at production sizes (the He build is the
                # single most expensive op in the body).
                if krylov_solver == "neumann":
                    He0 = elem_hess(xv)
                    d_e0 = jnp.diagonal(He0, axis1=1, axis2=2)
                    dvec0 = 1.0 + dt_tau * (
                        scatter_add_dense(
                            d_e0.reshape(-1, dp1, dim), dense_idx
                        ) * interior_nodes
                    )
                else:
                    He0 = dvec0 = None

                # TEST-THEN-STEP carry, matching the reference's loop
                # (Mesh.cpp:1287-1299: ||F|| tested BEFORE each solve):
                # the residual and its norm ride the carry, the body
                # steps unconditionally and evaluates the NEXT residual.
                #
                # STALL STOP (the actual fix for the "BE kernel fault at
                # >=77k elements"): the reference's absolute L1 test
                # ||F||_1 < 0.1*tol is unreachable in f32 at scale — the
                # summed rounding noise of ~1e5+ gradient entries alone
                # exceeds 1e-4 (measured floor ~6.5e-4 at Monitor1160,
                # probes R1/R2/hessw all land there) — so the loop ran to
                # the 1000-iteration cap every step, and the resulting
                # minutes-long device dispatch is what the tunnel kills
                # ("TPU device error"; probe R2's 47 s run survived,
                # heavier ones did not). Newton therefore also stops when
                # ||F|| stops DECREASING — at the f32 noise floor the
                # iterates have converged to everything the dtype can
                # express. f64/CPU runs are unaffected (quadratic drops
                # until the absolute test fires first; BE trace parity
                # tests pin this).
                def cond(carry):
                    it, _, _, gnorm, gprev = carry
                    progress = gnorm < gprev * 0.9999
                    return jnp.logical_and(
                        jnp.logical_and(
                            it < self.max_newton,
                            gnorm >= safety * self.tol,
                        ),
                        progress,
                    )

                def body(carry):
                    it, xv, Fv, gnorm, _gprev = carry

                    M = (lambda v: v / dj) if precondition else None
                    if krylov_solver == "neumann":
                        mv = matvec_from(He0)
                        dvec = dvec0
                        b = -Fv
                        dx = b / dvec
                        for _ in range(krylov_maxiter):
                            dx = dx + (b - mv(dx)) / dvec
                        # safeguard OUTSIDE the polynomial (probe R1's
                        # passing shape): a diverged solve (locally stiff
                        # He) falls back to the plain Jacobi step
                        rnorm = block_sum_f64(jnp.abs(b - mv(dx)))
                        bnorm = block_sum_f64(jnp.abs(b))
                        dx = jnp.where(rnorm <= bnorm, dx, b / dvec)
                    elif krylov_solver == "hess":
                        mv = matvec_from(elem_hess(xv))
                        dx, _ = krylov.bicgstab(
                            mv, -Fv, tol=krylov_tol,
                            maxiter=krylov_maxiter, M=M, unroll=True,
                        )
                    else:
                        def jvp(v):
                            return jax.jvp(
                                lambda y: residual(y, xn), (xv,), (v,)
                            )[1]

                        if krylov_solver == "scipy":
                            dx, _ = jax.scipy.sparse.linalg.bicgstab(
                                jvp, -Fv, tol=krylov_tol,
                                maxiter=krylov_maxiter, M=M,
                            )
                        else:
                            solve = (
                                krylov.bicgstab
                                if krylov_solver == "cgstab" else krylov.cg
                            )
                            dx, _ = solve(
                                jvp, -Fv, tol=krylov_tol,
                                maxiter=krylov_maxiter, M=M,
                            )
                    # finiteness test as a dtype-typed min, NOT
                    # jnp.all(jnp.isfinite(...)) — a bool reduction
                    # inside a while_loop is the construct ops/prox.py
                    # documents as uncompilable on this backend
                    finite = jnp.min(jnp.isfinite(dx).astype(dx.dtype))
                    dx = jnp.where(finite > 0.5, dx, -Fv)
                    x_new = xv + dx
                    Fv_new = residual(x_new, xn)
                    gnorm_new = block_sum_f64(jnp.abs(Fv_new))
                    # keep the BEST-seen iterate: when the step increases
                    # ||F|| the pre-step x rides the carry (the reference
                    # tests before stepping, Mesh.cpp:1287-1299, so it
                    # never returns a degraded iterate either); the stall
                    # stop then exits on gnorm == gprev
                    improved = gnorm_new < gnorm
                    xv = jnp.where(improved, x_new, xv)
                    Fv = jnp.where(improved, Fv_new, Fv)
                    gkeep = jnp.where(improved, gnorm_new, gnorm)
                    return it + 1, xv, Fv, gkeep, gnorm

                F0 = residual(xv, xn)
                g0 = block_sum_f64(jnp.abs(F0))
                it, xv, _, _, _ = jax.lax.while_loop(
                    cond, body,
                    (jnp.zeros((), jnp.int32), xv, F0, g0, jnp.inf),
                )
                return xv, it

            xn = x
            # initial guess: one explicit Euler step (Mesh.cpp:1271-1273)
            x = x - dt_tau * grad_i(x)
            x, n_newton = newton_solve(x, xn)
            # the reference returns Ih from the LAST eulerStepMod inside the
            # Newton loop, i.e. the post-step energy (Mesh.cpp:1289,1340)
            ih = mesh._energy_impl(x, F, xi, grid)
            return x, ih, n_newton

        if device_mesh is None:
            self.shards = None
            self._step_fn = step
            self._step_jit = jax.jit(step)
        else:
            # SPMD backward Euler over the "elems" axis: shard-local
            # gradient/Hessian assembly + one psum per matvec/gradient;
            # Krylov vectors and x stay replicated so the f64 block dots
            # are computed identically on every shard (deterministic).
            # The reference's BE is single-process (Mesh.cpp:1264-1341) —
            # this is new capability, like the sharded Euler.
            assert krylov_solver in ("hess", "neumann"), (
                "sharded BE supports the hess/neumann solvers only"
            )
            assert not precondition
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            from ..parallel.spmd import put_global
            from .euler import build_sharded_gradient

            shards = mesh.build_shards(device_mesh.devices.size)
            assert shards.dense_idx is not None, (
                "sharded BE requires the degree-padded scatter plan"
            )
            self.shards = shards
            grad_at = build_sharded_gradient(mesh, shards)
            n_pnts = mesh.n_pnts

            def local_step(x, F_l, xi_l, valid_l, dense_l, grid, interior):
                def grad_i(xv):
                    _, g = grad_at(xv, F_l, xi_l, valid_l, dense_l, grid,
                                   interior)
                    return g

                def residual(xv, xn):
                    return dt_tau * grad_i(xv) + (xv - xn)

                def elem_hess_l(xv):
                    # jacfwd of the analytic gradient, like the
                    # single-device elem_hess (no reverse-mode in-while)
                    z = xv[F_l]
                    cells = gather_cells(grid, z)

                    def h_one(zf, xi_e, cells_e):
                        return jax.jacfwd(
                            lambda q: huang.element_energy_grad(
                                q.reshape(dp1, dim), xi_e, None, ehat, cm,
                                cells=cells_e,
                            )[1].reshape(n)
                        )(zf)

                    return jax.vmap(h_one)(z.reshape(-1, n), xi_l, cells)

                def matvec_from(He):
                    def mv(v):
                        ve = v[F_l].reshape(-1, n)
                        hv = jnp.sum(He * ve[:, None, :], axis=2)
                        hv = hv * valid_l[:, None]
                        part = scatter_add_dense(
                            hv.reshape(-1, dp1, dim),
                            dense_l.reshape(n_pnts, -1),
                        )
                        out = jax.lax.psum(part, "elems")
                        return v + dt_tau * (out * interior)

                    return mv

                xn = x
                x = x - dt_tau * grad_i(x)

                # chord Jacobian built once per step at the initial
                # guess, like the single-device path / the reference
                if krylov_solver == "neumann":
                    He0 = elem_hess_l(x)
                    d_e0 = jnp.diagonal(He0, axis1=1, axis2=2)
                    d_e0 = d_e0 * valid_l[:, None]
                    part0 = scatter_add_dense(
                        d_e0.reshape(-1, dp1, dim),
                        dense_l.reshape(n_pnts, -1),
                    )
                    dvec0 = 1.0 + dt_tau * (
                        jax.lax.psum(part0, "elems") * interior
                    )
                else:
                    He0 = dvec0 = None

                def cond(carry):
                    # test-then-step + stall stop, like the single-device
                    # path (f32 L1 noise floor — see its comment)
                    it, _, _, gnorm, gprev = carry
                    progress = gnorm < gprev * 0.9999
                    return jnp.logical_and(
                        jnp.logical_and(
                            it < self.max_newton,
                            gnorm >= safety * self.tol,
                        ),
                        progress,
                    )

                def body(carry):
                    it, xv, Fv, gnorm, _gprev = carry
                    if krylov_solver == "neumann":
                        mv = matvec_from(He0)
                        dvec = dvec0
                        b = -Fv
                        dx = b / dvec
                        for _ in range(krylov_maxiter):
                            dx = dx + (b - mv(dx)) / dvec
                        rnorm = block_sum_f64(jnp.abs(b - mv(dx)))
                        bnorm = block_sum_f64(jnp.abs(b))
                        dx = jnp.where(rnorm <= bnorm, dx, b / dvec)
                    else:
                        dx, _ = krylov.bicgstab(
                            matvec_from(elem_hess_l(xv)), -Fv,
                            tol=krylov_tol, maxiter=krylov_maxiter,
                            unroll=True,
                        )
                    # finiteness test as a dtype-typed min, NOT
                    # jnp.all(jnp.isfinite(...)): a bool reduction inside
                    # a while_loop is the one step-body ingredient never
                    # covered by a passing probe, and the prox documents
                    # the same construct as uncompilable on this backend
                    # (ops/prox.py solve_dir)
                    finite = jnp.min(jnp.isfinite(dx).astype(dx.dtype))
                    dx = jnp.where(finite > 0.5, dx, -Fv)
                    x_new = xv + dx
                    Fv_new = residual(x_new, xn)
                    gnorm_new = block_sum_f64(jnp.abs(Fv_new))
                    # best-seen carry, like the single-device loop: a step
                    # that raises ||F|| is discarded and the stall stop
                    # exits on the pre-step iterate
                    improved = gnorm_new < gnorm
                    xv = jnp.where(improved, x_new, xv)
                    Fv = jnp.where(improved, Fv_new, Fv)
                    gkeep = jnp.where(improved, gnorm_new, gnorm)
                    return it + 1, xv, Fv, gkeep, gnorm

                F0 = residual(x, xn)
                g0 = block_sum_f64(jnp.abs(F0))
                n_newton, x, _, _, _ = jax.lax.while_loop(
                    cond, body,
                    (jnp.zeros((), jnp.int32), x, F0, g0, jnp.inf),
                )
                ih, _ = grad_at(x, F_l, xi_l, valid_l, dense_l, grid,
                                interior)
                return x, ih, n_newton

            sharded = shard_map(
                local_step,
                mesh=device_mesh,
                in_specs=(P(), P("elems"), P("elems"), P("elems"),
                          P("elems", None, None), P(), P()),
                out_specs=(P(), P(), P()),
                check_vma=False,
            )
            self._step_fn = sharded
            self._step_jit = jax.jit(sharded)
            self._args = tuple(
                put_global(a, device_mesh, s)
                for a, s in zip(
                    (shards.F, shards.xi, shards.valid, shards.dense_idx,
                     mesh.grid, mesh.interior_nodes),
                    (P("elems"), P("elems"), P("elems"),
                     P("elems", None, None), P(), P()),
                )
            )
        self._multi_cache: dict[int, object] = {}
        self._run_cache: dict[int, object] = {}

    def init_state(self) -> BackwardEulerState:
        x0 = self.mesh.X0
        if self.device_mesh is not None:
            from jax.sharding import PartitionSpec as P

            from ..parallel.spmd import put_global

            x0 = put_global(x0, self.device_mesh, P())
        return BackwardEulerState(x=x0)

    def run_device(self, state, *, cap, dt_tol, target_ih=None,
                   min_steps=0, stop_on_rise=False):
        """Whole-run device loop (see ``ADMMIntegrator.run_device``).
        Returns (state', ih_trace[cap] f64, steps i32)."""
        cap = int(cap)
        if cap not in self._run_cache:
            from .device_loop import build_run_loop

            step_fn = self._step_fn

            def step2(s, c):
                x, ih, _n = step_fn(s.x, *c)
                return BackwardEulerState(x=x), ih

            run = jax.jit(build_run_loop(step2, self.dt, cap))
            self._run_cache[cap] = lambda s, *a: run(s, self._args, *a)
        use = target_ih is not None
        return self._run_cache[cap](
            state,
            jnp.asarray(dt_tol, jnp.float64),
            jnp.asarray(target_ih if use else 0.0, jnp.float64),
            jnp.asarray(use),
            jnp.asarray(min_steps, jnp.int32),
            jnp.asarray(bool(stop_on_rise)),
        )

    def step(self, state: BackwardEulerState):
        x, ih, n_newton = self._step_jit(state.x, *self._args)
        return BackwardEulerState(x=x), float(ih)

    def multi_step(self, state: BackwardEulerState, k: int):
        """K BE steps in ONE device program (lax.scan over the damped
        Newton step) — amortizes per-step dispatch latency, like
        ADMMIntegrator.multi_step. Returns (state', ih[k])."""
        k = int(k)
        if k not in self._multi_cache:
            step_fn = self._step_fn

            def scan_fn(x, *args):
                def body(xc, _):
                    xn, ih, _ = step_fn(xc, *args)
                    return xn, ih

                return jax.lax.scan(body, x, None, length=k)

            self._multi_cache[k] = jax.jit(scan_fn)
        x, ihs = self._multi_cache[k](state.x, *self._args)
        return BackwardEulerState(x=x), ihs

    def energy(self, state: BackwardEulerState) -> float:
        return float(self.mesh.energy(state.x))

    def run(self, n_steps: int, dt_tol: float, state=None, verbose=False):
        if state is None:
            state = self.init_state()
        ih_trace = [self.energy(state)]
        ih_prev = float("inf")
        for i in range(n_steps):
            state, ih = self.step(state)
            ih_trace.append(ih)
            if verbose:
                print(f"step {i}: Ih={ih:.8g}")
            if i != 0 and abs((ih - ih_prev) / self.dt) < dt_tol:
                break
            ih_prev = ih
        return state, ih_trace
