"""Batched per-element proximal solve — the ADMM z-update hot kernel.

The reference runs warm-started BFGS per element under OpenMP
(``Mesh::prox`` -> ``bfgsOptSimplex``, ``src/Mesh.cpp:931-994, 778-872``):
50 iterations max, finite-difference initial Hessian, stop when
``|grad|_1 < tol`` after a step. TPU-first redesign: a *batched, branch-free
damped Newton* iteration over the whole element axis —

* gradient: the analytic formula (``ops.huang.element_energy_grad``),
* Jacobian of the gradient field: ``jax.jacfwd`` of that formula
  ((D+1)D x (D+1)D = 6x6 / 12x12 per element, closed-form small algebra, so
  forward-mode is cheap) — replacing the reference's O(n^2) FD Hessian
  (``Mesh.cpp:793-817``),
* the prox regularization contributes an exact ``w^2 I`` term that keeps the
  system strongly positive definite (w^2 = rho/4, reference
  ``Mesh.cpp:451``), plus a small Levenberg floor for near-inverted
  elements,
* per-element convergence masking inside a ``lax.while_loop`` — converged
  elements freeze, the loop exits when all elements are done (matching the
  reference's early exit without host round-trips). Like the reference,
  every element takes at least one step, and an element stops once the
  gradient at its *updated* point is below tol (``Mesh.cpp:827-855``).

Fixed-boundary vertices: their gradient components are zeroed and the
Jacobian rows/columns are replaced by identity, mirroring
``Mesh::computeBlockGrad`` (``Mesh.cpp:756-772``) and the reference's
identity Hessian diagonal trick (``Mesh.cpp:806-814``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .huang import _det, element_energy, element_energy_grad
from .linalg import ldlt_solve
from .monitor_grid import gather_cell

_LEVENBERG = 1e-9

# backtracking schedule: full Newton step, then halvings, then no move.
# Newton accepts alpha=1 near the minimizer so the safeguard is free on
# the hot path; it only engages for elements pushed toward inversion
# (where the reference would hit its assert(Edet>0),
# AdaptationFunctional.cpp:174 — we stay finite instead).
_ALPHAS = (1.0, 0.5, 0.25, 0.125, 0.0625, 0.0)


def make_element_kernels(ehat_const, comp_mesh: bool, w: float, dim: int):
    """Per-ELEMENT building blocks of the prox Newton solve, consumed by
    the vmapped solver (`make_prox_solver`). Every function here takes
    unbatched per-element arguments so alternative batchings (a future
    component-form Pallas kernel, tests) can reuse the same math."""
    n = dim * (dim + 1)
    # `grid` below refers to the call-time argument; every helper that
    # consumes it does so through frozen `cells`, so only gather_cells
    # touches the grid tensors. The dummy passed to element_energy* is
    # never read when cells is given (static branch in _common_terms).
    grid = None

    def grad_fn(z_flat, xi, dxpu, cells):
        _, g = element_energy_grad(
            z_flat.reshape(dim + 1, dim), xi, grid, ehat_const, comp_mesh,
            dxpu=dxpu.reshape(dim + 1, dim), w=w, cells=cells,
        )
        return g.reshape(n)

    def grad_fn_with_ih(z_flat, xi, dxpu, cells):
        ih, g = element_energy_grad(
            z_flat.reshape(dim + 1, dim), xi, grid, ehat_const, comp_mesh,
            dxpu=dxpu.reshape(dim + 1, dim), w=w, cells=cells,
        )
        # ih is unregularized (Igt); add the prox term for the line-search
        # reference energy — no separate energy evaluation needed
        e_reg = ih + 0.5 * w * w * jnp.sum((dxpu - z_flat) ** 2)
        return g.reshape(n), e_reg

    jac_fn = jax.jacfwd(grad_fn)

    def energy_fn(z_flat, xi, cells):
        return element_energy(
            z_flat.reshape(dim + 1, dim), xi, grid, ehat_const, comp_mesh,
            cells=cells,
        )

    def reg_energy(z_flat, xi, dxpu, cells):
        return element_energy(
            z_flat.reshape(dim + 1, dim), xi, grid, ehat_const, comp_mesh,
            dxpu=dxpu.reshape(dim + 1, dim), w=w, cells=cells,
        )

    def edet_of(zf):
        zm = zf.reshape(dim + 1, dim)
        return _det(jnp.swapaxes(zm[1:] - zm[0], 0, 1))

    def masked_jac(z_flat, xi, dxpu, free, cells):
        """Gradient Jacobian with fixed coords replaced by identity."""
        J = jac_fn(z_flat, xi, dxpu, cells)
        # identity built from 32-bit iota (jnp.eye/diag emit int64 iota
        # under x64, which Mosaic rejects); same values
        ii = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        eye = (ii == jj).astype(z_flat.dtype)
        # mask fixed coords: J' = M J M + (I - M)
        J = J * free[:, None] * free[None, :] + eye * (1.0 - free)
        return J + _LEVENBERG * eye

    def solve_dir(J, g):
        """Safeguarded solve: unrolled LDL^T (pure VPU; TPU has no f64
        batched-LU kernel), damped-gradient fallback on failure.

        The finiteness test is a dtype-typed min rather than
        ``jnp.all(jnp.isfinite(p))``: Mosaic lowers bool reductions via an
        f64 ``minimumf`` it cannot compile (observed on the real-TPU
        Pallas build); the f32 min is bit-identical in meaning."""
        p = ldlt_solve(J, -g)
        finite = jnp.isfinite(p).astype(p.dtype)
        bad = jnp.min(finite) < jnp.asarray(0.5, p.dtype)
        return jnp.where(bad, -g / (w * w), p)

    def newton_dir(z_flat, xi, dxpu, free, cells, J):
        """Newton direction from a (possibly stale, chord-method) Jacobian
        + gradient + line-search reference energy for one element.
        free: [n] 0/1."""
        g, e0 = grad_fn_with_ih(z_flat, xi, dxpu, cells)
        g = g * free
        gnorm = jnp.sum(jnp.abs(g))
        return solve_dir(J, g), g, gnorm, e0

    def trial_ok(z_flat, xi, dxpu, cells, e0, det_floor):
        """Accept test for one candidate point: finite, non-increasing
        regularized energy, and positively-oriented element (the det clamp
        in the energy makes inverted states look deceptively cheap; an
        already-inverted element only has to improve its det)."""
        e_a = reg_energy(z_flat, xi, dxpu, cells)
        return jnp.logical_and(
            jnp.logical_and(jnp.isfinite(e_a), e_a <= e0),
            edet_of(z_flat) > det_floor,
        )

    return dict(
        n=n,
        grad_fn=grad_fn,
        grad_fn_with_ih=grad_fn_with_ih,
        jac_fn=jac_fn,
        energy_fn=energy_fn,
        reg_energy=reg_energy,
        edet_of=edet_of,
        masked_jac=masked_jac,
        solve_dir=solve_dir,
        newton_dir=newton_dir,
        trial_ok=trial_ok,
    )


def make_prox_solver(ehat_const, comp_mesh: bool, w: float, dim: int,
                     jac_batch: int | None = None):
    """Returns ``prox(grid, z, xi, dxpu, free_mask, tol, max_iters) ->
    (z', ih0)`` operating on the full element batch (leading-axis vmap).

    ``grid`` (the MonitorGrid pytree) is a CALL-TIME argument, not a
    factory closure: closed-over arrays are embedded as HLO *constants*,
    and multi-MB constants (monitor grid + cell table at production mesh
    sizes) make the remote TPU compile pathologically slow. Passing them
    as parameters keeps the program size shape-independent.

    ``ih0`` is the per-element *unregularized* energy at the input z — the
    value the reference accumulates as the step functional
    (``bfgsOptSimplex`` returns Ihsave from the first evaluation,
    ``Mesh.cpp:791-792,968``).

    ``jac_batch``: optional slab size for the ENTRY Jacobian build — the
    ``jacfwd`` of the gradient materializes ~n tangent copies of the
    per-element intermediates, the peak-memory op of the solve at
    >500k-tet 3D meshes (the 3DMonitor240 HBM gap, VERDICT r3 item 3).
    ``lax.map(..., batch_size=jac_batch)`` streams the build through
    bounded slabs instead; None keeps the single full-batch vmap.
    """
    n = dim * (dim + 1)
    k = make_element_kernels(ehat_const, comp_mesh, w, dim)
    energy_fn = k["energy_fn"]
    edet_of = k["edet_of"]

    batched_energy = jax.vmap(energy_fn)
    # frozen interpolation cells: one grid gather per vertex per prox CALL,
    # making every Newton iteration gather-free (monitor_grid.gather_cell)
    gather_cells = jax.vmap(jax.vmap(gather_cell, in_axes=(None, 0)),
                            in_axes=(None, 0))
    batched_jac = jax.vmap(k["masked_jac"])
    if jac_batch is None:
        entry_jac = batched_jac
    else:
        jac_one = k["masked_jac"]

        def entry_jac(zf, xi, dxpuf, freef, cells):
            return jax.lax.map(
                lambda t: jac_one(*t), (zf, xi, dxpuf, freef, cells),
                batch_size=int(jac_batch),
            )
    batched_dir = jax.vmap(k["newton_dir"])
    batched_solve = jax.vmap(k["solve_dir"])
    batched_trial = jax.vmap(k["trial_ok"])

    def batched_iter(zc, xi, dxpuf, freef, cells, J):
        """One safeguarded-Newton sweep over the whole batch.

        Chord + refresh: ``J`` is the Jacobian from prox entry (the
        reference reuses a once-per-RUN FD Hessian with BFGS updates,
        Mesh.cpp:793-817 — ours is far fresher). The full chord step is
        tried for every element; only when some element rejects it does the
        slow branch run — which REFRESHES the Jacobian, re-solves, and
        backtracks. So the common iteration costs one gradient and ONE
        energy eval, and stale-J stagnation in the heavy transient is
        avoided."""
        p, g, gnorm, e0 = batched_dir(zc, xi, dxpuf, freef, cells, J)
        det0 = jax.vmap(edet_of)(zc)
        det_floor = jnp.minimum(det0, 0.0)
        ok1 = batched_trial(zc + p, xi, dxpuf, cells, e0, det_floor)

        def fast(_):
            alpha = jnp.ones(zc.shape[0], dtype=zc.dtype)
            return alpha, p, J

        def slow(_):
            # Per-element semantics (shard-grouping invariant): an element
            # whose chord step was accepted keeps it (and its stale J); a
            # rejected element gets a REFRESHED Jacobian, a re-solve, and
            # the backtracking schedule. The batch-level cond only decides
            # whether this extra work executes at all.
            J2 = entry_jac(zc, xi, dxpuf, freef, cells)
            p2 = batched_solve(J2, g)
            alpha_bt = jnp.zeros(zc.shape[0], dtype=zc.dtype)
            one = jnp.asarray(1.0, zc.dtype)
            for a in reversed(_ALPHAS[:-1]):  # 1.0 .. 0.0625, small->large
                ok = batched_trial(
                    zc + a * p2, xi, dxpuf, cells, e0, det_floor
                )
                # dtype-typed alpha (weak-f64 scalar branches break Mosaic)
                alpha_bt = jnp.where(ok, jnp.asarray(a, zc.dtype), alpha_bt)
            alpha = jnp.where(ok1, one, alpha_bt)
            p_used = jnp.where(ok1[:, None], p, p2)
            J_keep = jnp.where(ok1[:, None, None], J, J2)
            return alpha, p_used, J_keep

        alpha, p_used, J = jax.lax.cond(jnp.all(ok1), fast, slow, None)

        # stalled = accepted step is below the dtype's resolution at z —
        # no further progress is representable, so the element can retire
        # (keeps f32 from burning all 50 iterations at its noise floor)
        eps = 10.0 * jnp.finfo(zc.dtype).eps
        step_inf = alpha * jnp.max(jnp.abs(p_used), axis=1)
        stalled = step_inf <= eps * (1.0 + jnp.max(jnp.abs(zc), axis=1))
        return zc + alpha[:, None] * p_used, gnorm, stalled, J

    def prox(grid, z, xi, dxpu, free_mask, tol, max_iters, J_state=None):
        """grid: MonitorGrid (traced pytree); z, dxpu, free_mask:
        [NF, D+1, D]; xi: [NF, D+1, D] (dummy when not comp_mesh).
        Returns (z_opt [NF, D+1, D], ih0 [NF]).

        ``J_state``: optional ``(J_in [NF, n, n], fresh bool scalar)`` —
        the chord Jacobian carried across prox CALLS (ADMM iterations AND
        time steps; the reference warm-starts its cached inverse Hessians
        the same way, ``Mesh.cpp:456-464, 820, 867``). When given, the
        entry Jacobian build — the dominant fixed cost of a call (~20 ms
        at Monitor1320) — runs only when ``fresh`` is set (first call of a
        run); afterwards the per-element slow branch keeps J current by
        refreshing exactly the elements that reject a chord step. The
        return gains a third element, the updated J."""
        nf = z.shape[0]
        zf = z.reshape(nf, n)
        dxpuf = dxpu.reshape(nf, n)
        freef = free_mask.reshape(nf, n)

        cells = gather_cells(grid, z)  # frozen for the whole solve
        ih0 = batched_energy(zf, xi, cells)
        if J_state is None:
            J = entry_jac(zf, xi, dxpuf, freef, cells)  # entry Jacobian
        else:
            J_in, fresh = J_state
            J = jax.lax.cond(
                fresh,
                lambda: entry_jac(zf, xi, dxpuf, freef, cells),
                lambda: J_in,
            )

        def cond(carry):
            it, _, active, _ = carry
            return jnp.logical_and(it < max_iters, jnp.any(active))

        def body(carry):
            it, zc, active, Jc = carry
            znew, gnorm, stalled, Jc = batched_iter(
                zc, xi, dxpuf, freef, cells, Jc
            )
            # an element retires once the gradient at its current point is
            # below tol — but only from the second visit on (the reference
            # always takes at least one step, Mesh.cpp:827-833); or when the
            # accepted step has stalled at the dtype's resolution
            retire = jnp.logical_and(gnorm < tol, it > 0)
            active = jnp.logical_and(active, ~retire)
            zc = jnp.where(active[:, None], znew, zc)
            active = jnp.logical_and(active, ~stalled)
            return it + 1, zc, active, Jc

        active0 = jnp.ones(nf, dtype=bool)
        _, z_out, _, J_out = jax.lax.while_loop(
            cond, body, (jnp.int32(0), zf, active0, J)
        )
        z_opt = z_out.reshape(nf, dim + 1, dim)
        if J_state is None:
            return z_opt, ih0
        return z_opt, ih0, J_out

    return prox
