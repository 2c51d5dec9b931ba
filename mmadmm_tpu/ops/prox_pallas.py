"""Pallas TPU kernel for the ADMM prox (z-update) — VMEM-resident Newton.

Same math as ``ops.prox.make_prox_solver`` (the reference's per-element
BFGS under OpenMP, ``src/Mesh.cpp:931-994``, redesigned as safeguarded
chord-Newton), but executed as a single fused TPU kernel:

* **SoA lane layout**: the element batch is the TRAILING axis, tiled as
  ``(8, 128)`` f32 vregs. Every per-element scalar (an energy, a Jacobian
  entry, a line-search alpha) is one full vector register — the
  leading-batch vmap layout instead maps the tiny (D+1)D trailing dims onto
  the 128-lane axis, wasting >90% of each vector op.
* **VMEM residency**: the whole Newton solve for a tile of 1024 elements
  (z, frozen monitor cells, the 6x6/12x12 chord Jacobian, line-search
  state) lives in VMEM across ALL iterations. The XLA while_loop version
  streams ~50 f32/element of loop state through HBM every iteration; this
  kernel reads each element once and writes it once.
* **Per-tile early exit**: the convergence ``while_loop`` runs per tile of
  1024 elements, so a tile of converged elements retires without waiting
  for the slowest element in the whole batch (the XLA version's global
  while_loop iterates everything until the global slowest converges).

Per-element numerics are IDENTICAL to ``ops.prox`` — both backends consume
the same ``make_element_kernels`` closures, so an element's Newton
trajectory is the same sequence of floating-point operations; only the
batching axis and the granularity of the fast/slow chord branch (tile vs
whole batch) differ, neither of which changes per-element results.

The monitor-grid cell gather (dynamic indexing) stays in XLA where gathers
are native; the kernel receives pre-gathered frozen cells.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .monitor_grid import gather_cell
from .prox import _ALPHAS, make_element_kernels

# one tile = 8 sublanes x 128 lanes of elements = 1024 f32 vregs-slots
_SUB = 8
_LANES = 128
TILE = _SUB * _LANES


def _batch2(f):
    """vmap over the two TRAILING axes (sublane, lane) — per-element code
    runs with every intermediate laid out leading-small/trailing-(8,128)."""
    return jax.vmap(
        jax.vmap(f, in_axes=-1, out_axes=-1), in_axes=-1, out_axes=-1
    )


def make_prox_pallas(
    ehat_const, comp_mesh: bool, w: float, dim: int, *, interpret: bool = False
):
    """Drop-in replacement for ``make_prox_solver`` (same signature and
    semantics) running the Newton loop as a Pallas TPU kernel.

    f32 only (Mosaic has no f64); the f64 parity path keeps the vmapped
    solver.
    """
    n = dim * (dim + 1)
    dd = dim * dim
    ncorner = 2 ** dim
    nbnd = 2 * dim  # x0,x1,y0,y1[,z0,z1] per vertex

    gather_cells = jax.vmap(
        jax.vmap(gather_cell, in_axes=(None, 0)), in_axes=(None, 0)
    )

    bnd_keys = ("x0", "x1", "y0", "y1") + (("z0", "z1") if dim == 3 else ())

    def kernel(ehat_ref, z_ref, xi_ref, dxpu_ref, free_ref, cvals_ref,
               cbnd_ref, zout_ref, ih0_ref, *, tol, max_iters):
        # element kernels built per-trace with ehat read from VMEM —
        # pallas_call forbids closing over device arrays
        k = make_element_kernels(ehat_ref[:], comp_mesh, w, dim)
        b_energy = _batch2(k["energy_fn"])
        b_jac = _batch2(k["masked_jac"])
        b_dir = _batch2(k["newton_dir"])
        b_solve = _batch2(k["solve_dir"])
        b_trial = _batch2(k["trial_ok"])
        b_edet = _batch2(k["edet_of"])

        z0 = z_ref[:]  # [n, 8, 128]
        xi = xi_ref[:].reshape(dim + 1, dim, _SUB, _LANES)
        dxpu = dxpu_ref[:]
        free = free_ref[:]
        cvals = cvals_ref[:].reshape(dim + 1, ncorner, dd, _SUB, _LANES)
        cbnd = cbnd_ref[:].reshape(dim + 1, nbnd, _SUB, _LANES)
        cells = {"vals": cvals}
        for i, key in enumerate(bnd_keys):
            cells[key] = cbnd[:, i]

        ih0_ref[:] = b_energy(z0, xi, cells)
        J0 = b_jac(z0, xi, dxpu, free, cells)  # chord: entry Jacobian

        def tile_iter(zc, J):
            """One safeguarded-Newton sweep over the tile (the per-tile
            analogue of ``prox.make_prox_solver``'s batched_iter — same
            per-element outcomes, chord fast/slow branch decided per tile)."""
            p, g, gnorm, e0 = b_dir(zc, xi, dxpu, free, cells, J)
            det_floor = jnp.minimum(b_edet(zc), 0.0)
            ok1 = b_trial(zc + p, xi, dxpu, cells, e0, det_floor)

            def fast(_):
                alpha = jnp.ones((_SUB, _LANES), dtype=zc.dtype)
                return alpha, p, J

            def slow(_):
                J2 = b_jac(zc, xi, dxpu, free, cells)
                p2 = b_solve(J2, g)
                alpha_bt = jnp.zeros((_SUB, _LANES), dtype=zc.dtype)
                for a in reversed(_ALPHAS[:-1]):
                    ok = b_trial(zc + a * p2, xi, dxpu, cells, e0, det_floor)
                    # dtype-typed alphas: weak-f64 scalars break Mosaic
                    alpha_bt = jnp.where(
                        ok, jnp.asarray(a, zc.dtype), alpha_bt
                    )
                alpha = jnp.where(ok1, jnp.asarray(1.0, zc.dtype), alpha_bt)
                p_used = jnp.where(ok1[None], p, p2)
                J_keep = jnp.where(ok1[None, None], J, J2)
                return alpha, p_used, J_keep

            # scalar predicates via f32 min/max: Mosaic can only squeeze
            # 32-bit scalars, and bool reduce-to-scalar trips that check
            all_ok1 = jnp.min(ok1.astype(jnp.float32)) > 0.5
            alpha, p_used, J = jax.lax.cond(all_ok1, fast, slow, None)

            eps = 10.0 * jnp.finfo(zc.dtype).eps
            step_inf = alpha * jnp.max(jnp.abs(p_used), axis=0)
            stalled = step_inf <= eps * (1.0 + jnp.max(jnp.abs(zc), axis=0))
            return zc + alpha[None] * p_used, gnorm, stalled, J

        def cond(carry):
            it, _, active, _ = carry
            any_active = jnp.max(active.astype(jnp.float32)) > 0.5
            return jnp.logical_and(it < max_iters, any_active)

        def body(carry):
            it, zc, active, Jc = carry
            znew, gnorm, stalled, Jc = tile_iter(zc, Jc)
            retire = jnp.logical_and(gnorm < tol, it > 0)
            active = jnp.logical_and(active, ~retire)
            zc = jnp.where(active[None], znew, zc)
            active = jnp.logical_and(active, ~stalled)
            return it + 1, zc, active, Jc

        active0 = jnp.ones((_SUB, _LANES), dtype=bool)
        _, z_out, _, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), z0, active0, J0)
        )
        zout_ref[:] = z_out

    def _to_tiles(a_flat, lead):
        """[NFp, lead] -> [lead, R, 128] (R = NFp/128, row-major exact)."""
        return a_flat.T.reshape(lead, -1, _LANES)

    def prox(grid, z, xi, dxpu, free_mask, tol, max_iters, J_state=None):
        """Same contract as make_prox_solver's prox: z/dxpu/free
        [NF, D+1, D] -> (z_opt [NF, D+1, D], ih0 [NF]).

        ``J_state`` is accepted for API parity with the vmap backend's
        chord-Jacobian carry, but this kernel keeps its Jacobian
        VMEM-resident per tile and rebuilds it at entry (an in-VMEM
        rebuild is cheap; carrying [NF, n, n] through HBM is not), so the
        carried J is returned untouched."""
        nf = z.shape[0]
        dtype = z.dtype
        nfp = -(-nf // TILE) * TILE
        pad = nfp - nf

        # frozen cells gathered in XLA (native dynamic gather), then all
        # per-element data transposed once to the SoA tile layout
        cells = gather_cells(grid, z)

        def pad_edge(a):
            # replicate the last element — valid geometry, so padded lanes
            # run the same finite math and retire on the first iteration
            if pad == 0:
                return a
            return jnp.concatenate(
                [a, jnp.repeat(a[-1:], pad, axis=0)], axis=0
            )

        zt = _to_tiles(pad_edge(z.reshape(nf, n)), n)
        xit = _to_tiles(pad_edge(xi.reshape(nf, n).astype(dtype)), n)
        dxput = _to_tiles(pad_edge(dxpu.reshape(nf, n)), n)
        # padded elements are fully fixed -> zero gradient -> instant retire
        freef = free_mask.reshape(nf, n)
        if pad:
            freef = jnp.concatenate(
                [freef, jnp.zeros((pad, n), dtype)], axis=0
            )
        freet = _to_tiles(freef, n)
        cvalst = _to_tiles(
            pad_edge(cells["vals"].reshape(nf, (dim + 1) * ncorner * dd)),
            (dim + 1) * ncorner * dd,
        )
        cbnd = jnp.stack([cells[key] for key in bnd_keys], axis=2)
        cbndt = _to_tiles(
            pad_edge(cbnd.reshape(nf, (dim + 1) * nbnd)), (dim + 1) * nbnd
        )

        r_blocks = nfp // TILE  # grid steps; each handles 8 sublane rows

        def spec(lead):
            return pl.BlockSpec(
                (lead, _SUB, _LANES), lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            )

        zt_out, ih0t = pl.pallas_call(
            functools.partial(
                kernel, tol=float(tol), max_iters=int(max_iters)
            ),
            grid=(r_blocks,),
            in_specs=[
                pl.BlockSpec(
                    (dim, dim), lambda i: (0, 0), memory_space=pltpu.VMEM
                ),
                spec(n), spec(n), spec(n), spec(n),
                spec((dim + 1) * ncorner * dd), spec((dim + 1) * nbnd),
            ],
            out_specs=(
                spec(n),
                pl.BlockSpec(
                    (_SUB, _LANES), lambda i: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((n, nfp // _LANES, _LANES), dtype),
                jax.ShapeDtypeStruct((nfp // _LANES, _LANES), dtype),
            ),
            interpret=interpret,
        )(jnp.asarray(ehat_const, dtype), zt, xit, dxput, freet, cvalst,
          cbndt)

        z_out = zt_out.reshape(n, nfp).T[:nf].reshape(nf, dim + 1, dim)
        ih0 = ih0t.reshape(nfp)[:nf]
        if J_state is None:
            return z_out, ih0
        return z_out, ih0, J_state[0]

    return prox
