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
    # at-scale chord state (size-0 placeholders when the carry is off):
    # the reference re-assembles its FD Jacobian only on SLOW PROGRESS
    # (Mesh.cpp:1303-1313), not per step — He/dvec ride the state and are
    # rebuilt when the previous step's Newton count says the chord went
    # stale. x_prev feeds the extrapolated initial guess (2x - x_prev),
    # which replaces the reference's explicit-Euler guess
    # (Mesh.cpp:1271-1273) in steady state: one full gradient assembly
    # saved per step AND a closer start -> fewer Newton iterations.
    x_prev: jnp.ndarray
    He: jnp.ndarray      # [NF, n, n] chord element Hessians
    dvec: jnp.ndarray    # [NP, D] chord Jacobi diagonal
    steps: jnp.ndarray   # i32
    rebuild: jnp.ndarray  # bool — He went stale last step


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
        grid2d_dims: tuple[int, int] | None = None,
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

        # At-scale chord acceleration (VERDICT r4 item 3: the BE rows
        # barely cleared 1x). Two measures, both the reference's own
        # policies done properly:
        #   * He/dvec carried ACROSS STEPS, rebuilt only when the previous
        #     step's Newton count says the chord went stale (>= 4 iters)
        #     — the reference rebuilds on slow progress, Mesh.cpp:1303-13,
        #     not once per step; the build (12 jacfwd passes) is the most
        #     expensive op in the step.
        #   * extrapolated initial guess 2x - x_prev from step 2 on —
        #     closer than the explicit-Euler step in steady state and
        #     saves its full gradient assembly.
        # Gated to NF >= 50k (production sizes) so the small-config BE
        # trace parity pins keep the reference's exact per-step behavior;
        # MMADMM_BE_CHORD=0/1 overrides. Newton still solves F(x)=0 to
        # the same stop, so converged quality is unchanged — the bench's
        # quality_tol check pins that.
        # MEASURED OFF by default (scripts/tpu_be_chord_probe.py,
        # Monitor1160 m2 f32, 96 steps): chord-off 113.9 ms/step vs
        # chord-on 172.0 (rebuild_at=5) / 171.5 (8) ms/step — at these
        # dt/tau the carried linearization goes stale within a step, so
        # Newton pays back more than the skipped build saves, and an
        # extrapolated initial guess also lost (68.7 s vs 57.9 s to
        # quality). Both remain available for A/B via MMADMM_BE_CHORD=1.
        env_chord = os.environ.get("MMADMM_BE_CHORD")
        self.chord_carry = (
            env_chord == "1"
            and krylov_solver == "neumann" and device_mesh is None
        )
        self.rebuild_at = int(os.environ.get("MMADMM_BE_REBUILD", 5))

        # STENCIL matvec on structured 2D meshes (the BE analogue of the
        # GridADMM2D engine): each Richardson term is a
        # gather + He-multiply + scatter pipeline, and at production
        # sizes the two index ops are ~90% of its cost. With the
        # uncompacted rect-grid node layout they become window slices and
        # shifted pad-adds (ops/stencil2d.py); the per-element Hessian
        # blocks are remapped to dense-grid element order once per step.
        # Gated at scale (NF >= 50k) like the ADMM engine; the residual
        # and He build keep the compact path (their cost is the vmapped
        # energy-grad, not indexing). MMADMM_BE_GRID=0/1 overrides.
        self._grid2d = None
        env_grid = os.environ.get("MMADMM_BE_GRID")
        if (
            grid2d_dims is not None
            and krylov_solver == "neumann" and device_mesh is None
            and mesh.dim == 2
            and (env_grid == "1"
                 or (env_grid != "0" and mesh.n_elements >= 50_000))
        ):
            try:
                from ..ops.stencil2d import make_stencil_ops, match_dense

                gnx, gny = grid2d_dims
                stride = (gnx + 1) * (gny + 1)
                if mesh.n_pnts == stride + gnx * gny:
                    alive, swapped, m_of_d = match_dense(
                        gnx, gny, mesh._F_np
                    )
                    NFd = 4 * gnx * gny

                    def planes(v):
                        return v.reshape(gny, gnx, 4).transpose(2, 0, 1)

                    import numpy as _np

                    he_map = _np.where(
                        alive, m_of_d, mesh.n_elements
                    ).astype(_np.int32)
                    self._grid2d = dict(
                        ops=make_stencil_ops(gnx, gny),
                        swap_k=jnp.asarray(
                            planes(swapped.astype(_np.float64)),
                            dtype=mesh.dtype,
                        ),
                        alive_k=jnp.asarray(
                            planes(alive.astype(_np.float64)),
                            dtype=mesh.dtype,
                        ),
                        he_map=jnp.asarray(he_map),
                        valid_d=jnp.asarray(
                            alive.astype(_np.float64), dtype=mesh.dtype
                        ),
                        NFd=NFd,
                    )
                    # VMEM-resident grad/Hessian kernels (the prox
                    # kernel's component math): replaces the XLA jacfwd
                    # He build AND the vmapped gradient — the two
                    # dominant per-step costs after the stencil matvec.
                    # Needs the symmetric 16-wide cell table + whole
                    # (8,128) tiles; MMADMM_BE_KERNELS=0 for A/B.
                    if (
                        NFd % 1024 == 0
                        and mesh.grid.cell_table is not None
                        and not mesh.grid.constant
                        and mesh.grid.cell_table.shape[-1] == 16
                        and os.environ.get("MMADMM_BE_KERNELS") != "0"
                    ):
                        from ..ops.prox_pallas2d import make_be_kernels2d

                        interp = jax.default_backend() not in (
                            "tpu", "axon"
                        )
                        eg_k, hess_k = make_be_kernels2d(
                            mesh.ehat, interpret=interp
                        )
                        self._grid2d["eg"] = eg_k
                        self._grid2d["hess"] = hess_k
                        self._grid2d["Td"] = NFd // 1024
            except AssertionError:
                self._grid2d = None

        # mesh arrays threaded as call arguments (not closure constants —
        # same compile-size rationale as ADMMIntegrator._consts). The
        # stencil-engine masks ride along as a 5th argument (empty dict
        # when the engine is off).
        g2c = {}
        if self._grid2d is not None:
            g2c = dict(
                swap_k=self._grid2d["swap_k"],
                alive_k=self._grid2d["alive_k"],
                he_map=self._grid2d["he_map"],
                valid_d=self._grid2d["valid_d"],
            )
        self._args = (
            mesh.F, mesh.xi, mesh.grid,
            (mesh.elem_free, mesh.interior_nodes, mesh.dense_idx),
            g2c,
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

        chord_carry = self.chord_carry
        if self.chord_carry:
            # cap the carried-He footprint like the ADMM j_carry auto rule
            n_ = mesh.dim * (mesh.dim + 1)
            he_bytes = mesh.n_elements * n_ * n_ * jnp.dtype(mesh.dtype).itemsize
            if he_bytes > 400 * 2**20 and env_chord != "1":
                chord_carry = self.chord_carry = False

        use_grid_mv = self._grid2d is not None
        if use_grid_mv:
            _g_gather, _g_scatter = self._grid2d["ops"]
            _g_nfd = self._grid2d["NFd"]
        use_kernels = (
            use_grid_mv and "eg" in self._grid2d and not self.chord_carry
        )
        if use_kernels:
            _eg_k = self._grid2d["eg"]
            _hess_k = self._grid2d["hess"]
            _Td = self._grid2d["Td"]

        def step(state, F, xi, grid, masks, g2c):
            (x, x_prev, He_c, dvec_c, steps, rebuild) = state
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

            if use_grid_mv:
                def matvec_from(He):  # noqa: F811 — stencil override
                    """Stencil matvec: He blocks remapped to dense-grid
                    element order ONCE (when the mv closure is built,
                    i.e. once per chord build), then each J v is window
                    slices + 36 channel FMAs + shifted pad-adds — no
                    index ops in the Richardson loop."""
                    He_pad = jnp.concatenate(
                        [He.reshape(-1, n * n),
                         jnp.zeros((1, n * n), He.dtype)]
                    )
                    He_ch = He_pad[g2c["he_map"]].T  # [36, NFd]

                    def mv(v):
                        vz = _g_gather(v, g2c["swap_k"])  # [6, NFd]
                        hv = jnp.stack([
                            sum(He_ch[i * n + j] * vz[j] for j in range(n))
                            for i in range(n)
                        ])
                        out = _g_scatter(
                            hv, g2c["swap_k"], g2c["alive_k"]
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

            def build_chord(xv):
                """CHORD Jacobian for the neumann path: He and the Jacobi
                diagonal, built at the initial guess — the reference's
                policy (buildEulerJac at the initial guess, Mesh.cpp:1284,
                re-assembled only on slow progress). Without the at-scale
                carry this runs once per step; with it, only when the
                previous step's Newton count flagged the chord stale."""
                He0 = elem_hess(xv)
                d_e0 = jnp.diagonal(He0, axis1=1, axis2=2)
                dvec0 = 1.0 + dt_tau * (
                    scatter_add_dense(
                        d_e0.reshape(-1, dp1, dim), dense_idx
                    ) * interior_nodes
                )
                return He0, dvec0

            if use_kernels:
                # VMEM-kernel mode (structured 2D at scale): gradient,
                # energy and the Jacobian blocks come from the Pallas
                # component kernels on dense-grid tiles; He lives as its
                # lower triangle [21, NFd] and the matvec indexes it
                # symmetrically. These shadow grad_i / build_chord /
                # matvec_from (residual picks the new grad_i up by late
                # binding).
                from ..ops.monitor_grid import _cell_index as _ci

                def _cells_t(z_ch):
                    ax, ay = grid.axes
                    ncx = ax.shape[0] - 1
                    rows = []
                    for v in range(3):
                        xi_ = _ci(z_ch[v * 2], ax)
                        yi_ = _ci(z_ch[v * 2 + 1], ay)
                        rows.append(grid.cell_table[yi_ * ncx + xi_].T)
                    return jnp.concatenate(rows).reshape(
                        48, _Td, 8, 128
                    )

                def dense_eg(xv):
                    z_ch = _g_gather(xv, g2c["swap_k"])
                    g_t, ih_t = _eg_k(
                        z_ch.reshape(6, _Td, 8, 128), _cells_t(z_ch)
                    )
                    g = _g_scatter(
                        g_t.reshape(6, _g_nfd), g2c["swap_k"],
                        g2c["alive_k"],
                    ) * interior_nodes
                    ih = block_sum_f64(
                        jnp.where(
                            g2c["valid_d"] > 0,
                            ih_t.reshape(_g_nfd), 0.0,
                        )
                    )
                    return ih, g

                def grad_i(xv):  # noqa: F811 — kernel override
                    return dense_eg(xv)[1]

                def build_chord(xv):  # noqa: F811
                    z_ch = _g_gather(xv, g2c["swap_k"])
                    He_tri = _hess_k(
                        z_ch.reshape(6, _Td, 8, 128), _cells_t(z_ch)
                    ).reshape(21, _g_nfd)
                    diag = jnp.stack(
                        [He_tri[i * (i + 1) // 2 + i] for i in range(6)]
                    )
                    dvec0 = 1.0 + dt_tau * (
                        _g_scatter(
                            diag, g2c["swap_k"], g2c["alive_k"]
                        ) * interior_nodes
                    )
                    return He_tri, dvec0

                def matvec_from(He_tri):  # noqa: F811
                    def mv(v):
                        vz = _g_gather(v, g2c["swap_k"])
                        hv = jnp.stack([
                            sum(
                                He_tri[
                                    (max(i, j) * (max(i, j) + 1)) // 2
                                    + min(i, j)
                                ] * vz[j]
                                for j in range(6)
                            )
                            for i in range(6)
                        ])
                        out = _g_scatter(
                            hv, g2c["swap_k"], g2c["alive_k"]
                        )
                        return v + dt_tau * (out * interior_nodes)

                    return mv

            def newton_solve(xv, xn, He0, dvec0):
                # CHORD preconditioner: the Jacobi diagonal is assembled
                # once per time step at the initial guess and reused for
                # every Newton iteration — the diagonal drifts little
                # within a step, and re-assembling it per iteration costs
                # more than it saves (measured on Monitor1160:
                # scripts/be_precond_bench.py)
                dj = jac_diag(xv) if precondition else None
                # mv built once per solve (hoists the stencil path's
                # He remap out of the Newton while-loop)
                mv0 = (
                    matvec_from(He0) if krylov_solver == "neumann"
                    else None
                )

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
                        mv = mv0
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
            if chord_carry:
                # euler initial guess like the reference (an EXTRAPOLATED
                # guess 2x - x_prev was measured WORSE on Monitor1160 m2:
                # 68.7 s vs 57.9 s to quality — in this dissipative flow
                # the extrapolation overshoots the attractor and Newton
                # pays it back); He/dvec rebuilt only when flagged stale
                x_g = x - dt_tau * grad_i(x)
                He0, dvec0 = jax.lax.cond(
                    jnp.logical_or(steps == 0, rebuild),
                    lambda _: build_chord(x_g),
                    lambda _: (He_c, dvec_c),
                    None,
                )
            else:
                # reference behavior exactly: explicit-Euler initial
                # guess (Mesh.cpp:1271-1273) + per-step chord build
                x_g = x - dt_tau * grad_i(x)
                if krylov_solver == "neumann":
                    He0, dvec0 = build_chord(x_g)
                else:
                    He0 = dvec0 = None
            x2, n_newton = newton_solve(x_g, xn, He0, dvec0)
            # the reference returns Ih from the LAST eulerStepMod inside the
            # Newton loop, i.e. the post-step energy (Mesh.cpp:1289,1340)
            if use_kernels:
                ih = dense_eg(x2)[0]
            else:
                ih = mesh._energy_impl(x2, F, xi, grid)
            # stale-chord flag for the next step: a step that needed many
            # Newton iterations says the carried linearization has
            # drifted — rebuild next time (threshold measured: see
            # scripts/tpu_be_chord_probe.py)
            rebuild_next = n_newton >= jnp.int32(self.rebuild_at)
            if chord_carry:
                new_state = (x2, xn, He0, dvec0, steps + 1, rebuild_next)
            else:
                new_state = (x2, xn, He_c, dvec_c, steps + 1, rebuild_next)
            return new_state, ih, n_newton

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
        mesh = self.mesh
        n = mesh.dim * (mesh.dim + 1)
        nf_he = mesh.n_elements if self.chord_carry else 0
        np_he = mesh.n_pnts if self.chord_carry else 0
        He = jnp.zeros((nf_he, n, n), dtype=mesh.dtype)
        dvec = jnp.ones((np_he, mesh.dim), dtype=mesh.dtype)
        steps = jnp.zeros((), jnp.int32)
        rebuild = jnp.zeros((), bool)
        if self.device_mesh is not None:
            from jax.sharding import PartitionSpec as P

            from ..parallel.spmd import put_global

            x0 = put_global(x0, self.device_mesh, P())
        return BackwardEulerState(
            x=x0, x_prev=x0, He=He, dvec=dvec, steps=steps, rebuild=rebuild
        )

    def run_device(self, state, *, cap, dt_tol, target_ih=None,
                   min_steps=0, stop_on_rise=False):
        """Whole-run device loop (see ``ADMMIntegrator.run_device``).
        Returns (state', ih_trace[cap] f64, steps i32)."""
        cap = int(cap)
        if cap not in self._run_cache:
            from .device_loop import build_run_loop

            step_fn = self._step_fn
            sharded = self.shards is not None

            def step2(s, c):
                if sharded:
                    x, ih, _n = step_fn(s.x, *c)
                    return s._replace(x=x, x_prev=s.x), ih
                ns, ih, _n = step_fn(tuple(s), *c)
                return BackwardEulerState(*ns), ih

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
        if self.shards is not None:
            x, ih, _n = self._step_jit(state.x, *self._args)
            return state._replace(x=x, x_prev=state.x), float(ih)
        ns, ih, _n = self._step_jit(tuple(state), *self._args)
        return BackwardEulerState(*ns), float(ih)

    def multi_step(self, state: BackwardEulerState, k: int):
        """K BE steps in ONE device program (lax.scan over the damped
        Newton step) — amortizes per-step dispatch latency, like
        ADMMIntegrator.multi_step. Returns (state', ih[k])."""
        k = int(k)
        sharded = self.shards is not None
        if k not in self._multi_cache:
            step_fn = self._step_fn

            def scan_fn(s, *args):
                def body(carry, _):
                    if sharded:
                        xn, ih, _ = step_fn(carry.x, *args)
                        return carry._replace(x=xn, x_prev=carry.x), ih
                    ns, ih, _ = step_fn(tuple(carry), *args)
                    return BackwardEulerState(*ns), ih

                return jax.lax.scan(body, s, None, length=k)

            self._multi_cache[k] = jax.jit(scan_fn)
        state, ihs = self._multi_cache[k](state, *self._args)
        return state, ihs

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
