"""MM-ADMM time integrator.

Re-implements ``MeshIntegrator<D>`` (reference
``src/MeshIntegrator.{h,cpp}``) as a single jitted SPMD program per time
step. Structure of one step (``MeshIntegrator::step``,
``MeshIntegrator.cpp:101-191``):

  predictor  x_bar = x - (dt/tau) grad I   (first <=2 steps / gradUse,
                                            and after any Ihstart uptick —
                                            the ENERGY GUARD, see
                                            predictor() in _build_step)
             x_bar = 2 x - x_prev          (while Ihstart decreases;
                                            Mesh::predictX,
                                            Mesh.cpp:650-674)
  z = D x_bar   (step 0: z = D x_prev; u_bar = 0 before any prox)
  x-update   x = t^{-1} (tau x_bar + dt^2 w D^T (w (z - u_bar)))
             -- t = tau I + dt^2 w^2 D^T D is DIAGONAL (D is a pure gather,
                so D^T D = diag(node degree)); the reference's Eigen CG
                solve (MeshIntegrator.cpp:137-139) is a pointwise division
                here.
  ADMM loop (<= nIters, early exit):
     DXpU = D x + u_bar
     z    = prox(z; DXpU)                  (Mesh::prox — batched Newton)
     u    = DXpU - z
     x    = x-update(z, u)
     stop when ||D x - z|| < tol and ||z - z_prev|| < tol
                                           (MeshIntegrator.cpp:162-169)

Returns Ihstart — the functional value at the first prox's input z
(``MeshIntegrator.cpp:146-151``), which is what the recorded ``Ih*.txt``
baselines trace. The outer time loop with the |dI/dt| < DtTol stop
(``main.cpp:180-211``) stays in Python (dynamic), everything else is one
compiled program; dual state u_bar persists across time steps (warm start).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..mesh import MovingMesh
from ..ops.reductions import block_sum_f64, block_sumsq_f64


class ADMMState(NamedTuple):
    x: jnp.ndarray  # [NP, D]
    x_prev: jnp.ndarray  # [NP, D]
    u_bar: jnp.ndarray  # [NF, D+1, D]
    steps: jnp.ndarray  # i32 scalar — stepsTaken (MeshIntegrator.h:46)
    ih_last: jnp.ndarray  # f64 scalar — Ihstart of the previous step
    rose: jnp.ndarray  # bool scalar — Ihstart rose at the previous step
    # i32 scalar — consecutive Ihstart rises. One rise -> the euler
    # damper (matches the recorded reference artifacts); >= 2 -> the
    # euler map itself is unstable at this dt/tau (seen on Monitor3160:
    # energy creeps monotonically to the euler-map equilibrium ~3% above
    # the minimum), so the predictor falls back to the PROXIMAL damper
    # x_bar = x, whose step amplification 1/(1 + dt^2 lambda / tau) < 1
    # is unconditionally stable
    rises: jnp.ndarray
    # chord Jacobian carried across prox calls AND time steps [NF, n, n]
    # (the reference warm-starts its cached inverse Hessians the same way,
    # Mesh.cpp:456-464); built fresh on the first call of a run, kept
    # current afterwards by the prox slow branch's per-element refresh
    J: jnp.ndarray
    # bool scalar: J must be (re)built at the next prox call. True from
    # init_state; set True by checkpoint resume when J could not be
    # restored (pre-J checkpoints, single<->sharded shape mismatch) —
    # without it a zero J silently degrades the prox to fallback steps
    j_fresh: jnp.ndarray


class StepInfo(NamedTuple):
    ih_start: jnp.ndarray
    primal: jnp.ndarray
    dual: jnp.ndarray
    n_iters: jnp.ndarray


class ADMMIntegrator:
    def __init__(
        self,
        mesh: MovingMesh,
        dt: float,
        *,
        admm_iters: int = 10,
        tol: float = 1e-3,
        prox_tol: float | None = None,
        prox_max_iters: int = 50,
        grad_use: bool = False,
        sticky_guard: bool = False,
        device_mesh=None,
        halo: bool | None = None,
        j_carry: bool | None = None,
    ):
        self.mesh = mesh
        self.dt = float(dt)
        self.admm_iters = int(admm_iters)
        self.tol = float(tol)
        # per-element prox gradient tolerance; the reference hard-couples it
        # to the step tolerance (tol/100, Mesh.cpp:968) — kept as the
        # default but decoupled so the stop test can be tightened without
        # dragging the Newton solve with it
        self.prox_tol = float(prox_tol) if prox_tol is not None else self.tol / 100.0
        self.prox_max_iters = int(prox_max_iters)
        self.grad_use = bool(grad_use)
        # sticky_guard: once the energy guard trips, stay on the gradient
        # predictor for the rest of the run (pure damped descent tail)
        # instead of re-enabling extrapolation when Ih falls again
        self.sticky_guard = bool(sticky_guard)
        self.device_mesh = device_mesh
        # owner-computes halo exchange in the sharded step (SURVEY §7):
        # per ADMM iteration only the shared-cut partial sums are
        # all-reduced instead of the full node field. Bit-compatible with
        # the full-psum path (each node's sum has the same contributors);
        # MMADMM_HALO=0 restores the full all-reduce for A/B runs.
        if halo is None:
            halo = os.environ.get("MMADMM_HALO", "1") != "0"
        self.halo = bool(halo)
        # chord-Jacobian carry across prox calls/time steps. At 3D
        # production sizes the carried [NF, 12, 12] tensor is the
        # largest live buffer (442 MB at 3DMonitor240's 768k tets, held
        # across the whole run + its while-loop double buffer) — the HBM
        # gap VERDICT r3 item 3 names. ``j_carry=False`` drops it from
        # the state entirely: the prox rebuilds the entry Jacobian each
        # CALL (slab-streamed, ``ops.prox jac_batch``) and keeps it only
        # for the call's lifetime. Auto: carry while the tensor is
        # <= 400 MB; MMADMM_JCARRY=0/1 overrides.
        if mesh.prox_backend == "pallas":
            # the kernel rebuilds its Jacobian in VMEM per tile — there is
            # no HBM chord-J to carry, so the pallas path ALWAYS runs
            # j_carry=False. An explicit j_carry=True (argument or
            # MMADMM_JCARRY=1) is a contradiction, not a preference: warn
            # and ignore rather than thread a dead [NF, n, n] tensor
            # through the state.
            env = os.environ.get("MMADMM_JCARRY")
            if j_carry or (j_carry is None and env == "1"):
                import warnings

                warnings.warn(
                    "prox_backend='pallas' ignores j_carry=True: the "
                    "kernel keeps its Jacobian VMEM-resident per tile",
                    stacklevel=2,
                )
            j_carry = False
        if j_carry is None:
            env = os.environ.get("MMADMM_JCARRY")
            if env is not None:
                j_carry = env != "0"
            else:
                nn = mesh.dim * (mesh.dim + 1)
                j_bytes = (
                    mesh.n_elements * nn * nn * jnp.dtype(mesh.dtype).itemsize
                )
                j_carry = j_bytes <= 400 * 2**20
        self.j_carry = bool(j_carry)
        self._multi_cache: dict[int, Any] = {}
        self._run_cache: dict[int, Any] = {}
        if device_mesh is None:
            self.shards = None
            # step_fn(state, consts): the mesh arrays are call arguments,
            # not closure constants (see _consts)
            self.step_fn = self._build_step()
            self._step_jit = jax.jit(self.step_fn)
            self.consts = self._consts()
            self._step = lambda s: self._step_jit(s, self.consts)
        else:
            self.shards = mesh.build_shards(device_mesh.devices.size)
            self._step = self._build_sharded_step()

    def init_state(self) -> ADMMState:
        x0 = self.mesh.X0
        n_elem = (
            self.mesh.n_elements if self.shards is None
            else self.shards.F.shape[0]
        )
        u_bar = jnp.zeros(
            (n_elem, self.mesh.dim + 1, self.mesh.dim), dtype=self.mesh.dtype
        )
        steps = jnp.zeros((), dtype=jnp.int32)
        ih_last = jnp.asarray(jnp.inf, dtype=jnp.float64)
        rose = jnp.zeros((), dtype=bool)
        rises = jnp.zeros((), dtype=jnp.int32)
        nn = (self.mesh.dim * (self.mesh.dim + 1)) if self.j_carry else 0
        # zeros + j_fresh=True — the first prox call of a run builds the
        # real entry Jacobian. Size-0 placeholder when the carry is off
        # (j_carry=False: the prox rebuilds J per call instead)
        J = jnp.zeros((n_elem, nn, nn), dtype=self.mesh.dtype)
        j_fresh = jnp.ones((), dtype=bool)
        if self.shards is not None:
            from jax.sharding import PartitionSpec as P

            from ..parallel.spmd import put_global

            u_bar = put_global(u_bar, self.device_mesh, P("elems"))
            x0 = put_global(x0, self.device_mesh, P())
            steps = put_global(steps, self.device_mesh, P())
            ih_last = put_global(ih_last, self.device_mesh, P())
            rose = put_global(rose, self.device_mesh, P())
            rises = put_global(rises, self.device_mesh, P())
            J = put_global(J, self.device_mesh, P("elems"))
            j_fresh = put_global(j_fresh, self.device_mesh, P())
        return ADMMState(
            x=x0,
            x_prev=x0,
            u_bar=u_bar,
            steps=steps,
            ih_last=ih_last,
            rose=rose,
            rises=rises,
            J=J,
            j_fresh=j_fresh,
        )

    # ------------------------------------------------------------------
    def _consts(self):
        """The mesh arrays the step program reads, as a pytree threaded
        through jit as ARGUMENTS. Closing over them would embed them as HLO
        constants — tens of MB at production sizes — which makes the
        (remote) TPU compile time scale with the mesh instead of the
        program."""
        mesh = self.mesh
        return dict(
            F=mesh.F,
            dense_idx=mesh.dense_idx,
            xi=mesh.xi,
            elem_free=mesh.elem_free,
            deg=mesh.deg,
            grid=mesh.grid,
        )

    def _build_step(self):
        from ..ops.scatter import gather_elements, scatter_add_dense

        mesh = self.mesh
        dt = self.dt
        tau = mesh.tau
        w = mesh.w
        dt2w2 = dt * dt * w * w
        tol = self.tol
        prox_tol = self.prox_tol
        n_iters = self.admm_iters
        prox_iters = self.prox_max_iters
        prox_fn = mesh.prox_fn
        energy_grad_e = mesh._energy_grad_e

        def step(state: ADMMState, c: dict):
            # diagonal of t = tau I + dt^2 w^2 D^T D (MeshIntegrator.cpp:51)
            t_diag = tau + dt2w2 * c["deg"]  # [NP]

            def gather(xv):
                return gather_elements(xv, c["F"])

            def x_update(x_bar, z, u_bar):
                # vec = tau x_bar + dt^2 w D^T (w (z - u_bar))
                # (MeshIntegrator.cpp:137-139,159-160)
                rhs = tau * x_bar + dt2w2 * scatter_add_dense(
                    z - u_bar, c["dense_idx"]
                )
                return rhs / t_diag[:, None]

            def predictor(x, x_prev, steps, rose, rises):
                # Mesh::predictX (Mesh.cpp:650-674) with an ENERGY GUARD:
                # extrapolation (2x - x_prev) is used only while Ihstart is
                # decreasing; after an uptick the gradient predictor runs
                # for a step. The shipped reference extrapolates
                # unconditionally, which is unstable at the fine-mesh /
                # small-dt configs (Monitor1{160,320}): the rebuilt
                # reference binary diverges and aborts on its own shipped
                # configs (Edet>0 assert, AdaptationFunctional.cpp:174),
                # while its RECORDED traces damp exactly one step after the
                # first uptick (Results/Monitor1160/Ih0.txt rows 21-23) —
                # matching this guard, which the published artifacts
                # evidently had. If the energy rises under the euler
                # damper TOO (>= 2 consecutive rises — the euler map is
                # unstable at this dt/tau, observed on Monitor3160), fall
                # back to the proximal damper x_bar = x: the implicit step
                # then contracts every eigenmode (1/(1 + dt^2 lambda/tau)),
                # so the creep toward the euler-map equilibrium cannot
                # happen.
                def euler(_):
                    ih_e, g_e = energy_grad_e(gather(x), c["xi"], c["grid"])
                    g = scatter_add_dense(
                        g_e * c["elem_free"], c["dense_idx"]
                    )
                    return x - (dt / tau) * g

                def extrap(_):
                    return 2.0 * x - x_prev

                def damped(_):
                    return jax.lax.cond(rises >= 2, lambda _: x, euler, None)

                if self.grad_use:
                    return euler(None)
                return jax.lax.cond(
                    steps <= 2, euler,
                    lambda _: jax.lax.cond(rose, damped, extrap, None),
                    None,
                )

            (x, x_prev, u_bar, steps, ih_last, rose, rises, J,
             j_fresh) = state
            x_bar = predictor(x, x_prev, steps, rose, rises)

            x_prev = x
            x = x_bar
            # z = D x (step 0: D x_prev); MeshIntegrator.cpp:121-127
            z = jax.lax.cond(
                steps == 0,
                lambda _: gather(x_prev),
                lambda _: gather(x),
                None,
            )
            # uBar zeroed before the first prox ever (stepTaken flag)
            u_bar = jnp.where(steps == 0, jnp.zeros_like(u_bar), u_bar)

            x = x_update(x_bar, z, u_bar)

            def cond(carry):
                i, done, *_ = carry
                return jnp.logical_and(i < n_iters, ~done)

            def body(carry):
                # gx = D x is carried across iterations so each iteration
                # performs exactly one gather (dxpu and the primal residual
                # share it)
                i, _, x, gx, z, u_bar, J, ih_start, primal, dual = carry
                dxpu = gx + u_bar
                z_prev = z
                if self.j_carry:
                    fresh = jnp.logical_and(j_fresh, i == 0)
                    z, ih0_e, J = prox_fn(
                        c["grid"], z, c["xi"], dxpu, c["elem_free"],
                        prox_tol, prox_iters, (J, fresh),
                    )
                else:
                    z, ih0_e = prox_fn(
                        c["grid"], z, c["xi"], dxpu, c["elem_free"],
                        prox_tol, prox_iters,
                    )
                ih_cur = block_sum_f64(ih0_e)
                ih_start = jnp.where(i == 0, ih_cur, ih_start)
                u_bar = dxpu - z
                x = x_update(x_bar, z, u_bar)
                gx = gather(x)
                primal = jnp.sqrt(block_sumsq_f64(gx - z))
                dual = jnp.sqrt(block_sumsq_f64(z - z_prev))
                done = jnp.logical_and(primal < tol, dual < tol)
                return (i + 1, done, x, gx, z, u_bar, J, ih_start, primal,
                        dual)

            init = (
                jnp.zeros((), jnp.int32),
                jnp.zeros((), bool),
                x,
                gather(x),
                z,
                u_bar,
                J,
                jnp.zeros((), jnp.float64),
                jnp.zeros((), jnp.float64),
                jnp.zeros((), jnp.float64),
            )
            (i, _, x, _, z, u_bar, J, ih_start, primal,
             dual) = jax.lax.while_loop(cond, body, init)

            rose_next = ih_start > ih_last
            if self.sticky_guard:
                rose_next = jnp.logical_or(rose, rose_next)
            rises_next = jnp.where(ih_start > ih_last, rises + 1, 0)
            new_state = ADMMState(
                x=x, x_prev=x_prev, u_bar=u_bar, steps=steps + 1,
                ih_last=ih_start, rose=rose_next, rises=rises_next, J=J,
                j_fresh=jnp.zeros((), dtype=bool),
            )
            return new_state, StepInfo(
                ih_start=ih_start, primal=primal, dual=dual, n_iters=i
            )

        return step

    # ------------------------------------------------------------------
    def _build_sharded_step(self):
        """SPMD step over the ``"elems"`` mesh axis via shard_map.

        Element-local work (gather, prox, dual update, residual partial
        sums) runs on each shard's slice; node-field assembly is a local
        ``segment_sum`` into a full-size [NP, D] buffer followed by one
        ``psum`` (the domain analogue of a DP gradient all-reduce). x and
        the scalars are replicated. Semantics are identical to the
        single-device step up to float reduction order.
        """
        from jax import shard_map
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = self.mesh
        shards = self.shards
        dmesh = self.device_mesh
        n_shards = shards.n_shards
        nfp = shards.F.shape[0]
        L = nfp // n_shards
        dim = mesh.dim
        dp1 = dim + 1

        dt = self.dt
        tau = mesh.tau
        w = mesh.w
        dt2w2 = dt * dt * w * w
        tol = self.tol
        prox_tol = self.prox_tol
        n_iters = self.admm_iters
        prox_iters = self.prox_max_iters
        n_pnts = mesh.n_pnts
        prox_fn = mesh.prox_fn

        use_dense = shards.dense_idx is not None
        halo = self.halo

        def local_step(state, F_l, xi_l, free_l, valid_l, perm_l, seg_l,
                       dense_l, ctrb_l, shared_ids, is_shared, shared_slot,
                       grid, deg):
            # replicated node-degree vector -> x-update diagonal
            # (MeshIntegrator.cpp:51); computed in-graph from the threaded
            # argument so no [NP] constant is embedded
            t_diag = tau + dt2w2 * deg
            (x, x_prev, u_bar_l, steps, ih_last, rose, rises, J_l,
             j_fresh) = state
            perm_l = perm_l.reshape(-1)
            seg_l = seg_l.reshape(-1)
            ctrb_l = ctrb_l.reshape(-1)
            valid_e = valid_l[:, None, None]

            def local_partial(vals_l):
                flat = (vals_l * valid_e).reshape(L * dp1, dim)
                if use_dense:
                    from ..ops.scatter import scatter_add_dense

                    return scatter_add_dense(
                        flat.reshape(L, dp1, dim), dense_l.reshape(n_pnts, -1)
                    )
                return jax.ops.segment_sum(
                    flat[perm_l], seg_l, num_segments=n_pnts,
                    indices_are_sorted=True,
                )

            def scatter(vals_l):
                part = local_partial(vals_l)
                if not halo:
                    return jax.lax.psum(part, "elems")
                # owner-computes: a node touched by ONE shard has its full
                # sum locally (other shards contribute exact zeros in the
                # full-psum path); only the shared cut set C needs the
                # all-reduce — [C, D] traffic per call instead of [NP, D].
                # Rows private to OTHER shards are left incomplete; they
                # are never gathered here and are masked out of the
                # end-of-step ownership psum.
                shared_sum = jax.lax.psum(part[shared_ids], "elems")
                padded = jnp.concatenate(
                    [shared_sum, jnp.zeros((1, dim), dtype=part.dtype)]
                )
                return jnp.where(
                    is_shared[:, None] > 0, padded[shared_slot], part
                )

            def gather(xv):
                return xv[F_l]

            def x_update(x_bar, z_l, u_l):
                rhs = tau * x_bar + dt2w2 * scatter(z_l - u_l)
                return rhs / t_diag[:, None]

            def grad_at(xv):
                z_l = gather(xv)
                # frozen-cell monitor fetch (one wide-row gather per vertex;
                # bit-identical to sample_monitor — same cell, same bilinear
                # expression) instead of 2^D narrow grid gathers per vertex
                from ..ops.monitor_grid import gather_cell

                cells_l = jax.vmap(
                    jax.vmap(gather_cell, in_axes=(None, 0)),
                    in_axes=(None, 0),
                )(grid, z_l)
                ih_e, g_e = jax.vmap(_eg)(z_l, xi_l, cells_l)
                g = scatter(g_e * free_l)
                ih = jax.lax.psum(block_sum_f64(ih_e * valid_l), "elems")
                return ih, g

            def _eg(z, xi, cells):
                from ..ops import huang

                return huang.element_energy_grad(
                    z, xi, None, mesh.ehat, mesh.comp_mesh, cells=cells
                )

            def predictor(x, x_prev, steps, rose, rises):
                # energy-guarded predictor with the proximal fallback for
                # consecutive rises — see _build_step for the rationale
                def euler(_):
                    _, g = grad_at(x)
                    return x - (dt / tau) * g

                def extrap(_):
                    return 2.0 * x - x_prev

                def damped(_):
                    return jax.lax.cond(rises >= 2, lambda _: x, euler, None)

                if self.grad_use:
                    return euler(None)
                return jax.lax.cond(
                    steps <= 2, euler,
                    lambda _: jax.lax.cond(rose, damped, extrap, None),
                    None,
                )

            x_bar = predictor(x, x_prev, steps, rose, rises)
            x_prev = x
            x = x_bar
            z_l = jax.lax.cond(
                steps == 0,
                lambda _: gather(x_prev),
                lambda _: gather(x),
                None,
            )
            u_bar_l = jnp.where(steps == 0, jnp.zeros_like(u_bar_l), u_bar_l)
            x = x_update(x_bar, z_l, u_bar_l)

            def norm_sq(v_l):
                return jax.lax.psum(
                    block_sumsq_f64(v_l * valid_e), "elems"
                )

            def cond(carry):
                i, done, *_ = carry
                return jnp.logical_and(i < n_iters, ~done)

            def body(carry):
                # gx_l carried: one gather per iteration (shared by dxpu
                # and the primal residual)
                i, _, x, gx_l, z_l, u_l, J_l, ih_start, primal, dual = carry
                dxpu_l = gx_l + u_l
                z_prev_l = z_l
                if self.j_carry:
                    fresh = jnp.logical_and(j_fresh, i == 0)
                    z_l, ih0_e, J_l = prox_fn(
                        grid, z_l, xi_l, dxpu_l, free_l, prox_tol,
                        prox_iters, (J_l, fresh),
                    )
                else:
                    z_l, ih0_e = prox_fn(
                        grid, z_l, xi_l, dxpu_l, free_l, prox_tol,
                        prox_iters,
                    )
                ih_cur = jax.lax.psum(
                    block_sum_f64(ih0_e * valid_l), "elems"
                )
                ih_start = jnp.where(i == 0, ih_cur, ih_start)
                u_l = dxpu_l - z_l
                x = x_update(x_bar, z_l, u_l)
                gx_l = gather(x)
                primal = jnp.sqrt(norm_sq(gx_l - z_l))
                dual = jnp.sqrt(norm_sq(z_l - z_prev_l))
                done = jnp.logical_and(primal < tol, dual < tol)
                return (i + 1, done, x, gx_l, z_l, u_l, J_l, ih_start,
                        primal, dual)

            init = (
                jnp.zeros((), jnp.int32),
                jnp.zeros((), bool),
                x,
                gather(x),
                z_l,
                u_bar_l,
                J_l,
                jnp.zeros((), jnp.float64),
                jnp.zeros((), jnp.float64),
                jnp.zeros((), jnp.float64),
            )
            (i, _, x, _, z_l, u_bar_l, J_l, ih_start, primal,
             dual) = jax.lax.while_loop(cond, body, init)

            if halo:
                # rebuild the replicated node field ONCE per outer step:
                # every node has exactly one owner (contrib), whose rows
                # are complete — private by locality, shared by the loop's
                # C-buffer psum — so this psum adds one value + zeros
                x = jax.lax.psum(x * ctrb_l[:, None], "elems")

            rose_next = ih_start > ih_last
            if self.sticky_guard:
                rose_next = jnp.logical_or(rose, rose_next)
            rises_next = jnp.where(ih_start > ih_last, rises + 1, 0)
            new_state = ADMMState(
                x=x, x_prev=x_prev, u_bar=u_bar_l, steps=steps + 1,
                ih_last=ih_start, rose=rose_next, rises=rises_next, J=J_l,
                j_fresh=jnp.zeros((), dtype=bool),
            )
            return new_state, StepInfo(
                ih_start=ih_start, primal=primal, dual=dual, n_iters=i
            )

        state_specs = ADMMState(
            x=P(), x_prev=P(), u_bar=P("elems"), steps=P(),
            ih_last=P(), rose=P(), rises=P(), J=P("elems"), j_fresh=P(),
        )
        info_specs = StepInfo(
            ih_start=P(), primal=P(), dual=P(), n_iters=P()
        )
        dense_arg = (
            shards.dense_idx
            if use_dense
            else jnp.zeros((n_shards, 1, 1), jnp.int32)
        )
        sharded = shard_map(
            local_step,
            mesh=dmesh,
            in_specs=(
                state_specs, P("elems"), P("elems"), P("elems"),
                P("elems"), P("elems", None), P("elems", None),
                P("elems", None, None), P("elems", None),
                P(), P(), P(), P(), P(),
            ),
            out_specs=(state_specs, info_specs),
            check_vma=False,
        )
        jitted = jax.jit(sharded)
        # unjitted fn + explicit args kept for multi_step's scan so shard
        # arrays stay call arguments there too (never HLO constants).
        # Args are committed to their shard_map specs up front — required in
        # multi-process runs (each process holds only its addressable
        # shards), a no-op device_put otherwise.
        from ..parallel.spmd import put_global

        self._sharded_fn = sharded
        arg_specs = (
            P("elems"), P("elems"), P("elems"), P("elems"),
            P("elems", None), P("elems", None), P("elems", None, None),
            P("elems", None),
            P(), P(), P(), P(), P(),
        )
        self._sharded_args = tuple(
            put_global(a, dmesh, s)
            for a, s in zip(
                (shards.F, shards.xi, shards.elem_free, shards.valid,
                 shards.perm, shards.seg, dense_arg, shards.contrib,
                 shards.shared_ids, shards.is_shared, shards.shared_slot,
                 mesh.grid, mesh.deg),
                arg_specs,
            )
        )

        def step(state):
            return jitted(state, *self._sharded_args)

        return step

    # ------------------------------------------------------------------
    def step(self, state: ADMMState):
        """One outer time step. Returns (state', StepInfo)."""
        return self._step(state)

    def multi_step(self, state: ADMMState, k: int):
        """K outer time steps in ONE device program (lax.scan over the step).

        Amortizes per-call host->device dispatch latency — the analogue of
        the reference's tight C++ outer loop (main.cpp:180-211). Returns
        (state', StepInfo with leading axis K). The |dIh/dt| < DtTol stop is
        then applied per chunk by the caller instead of per step.
        """
        k = int(k)
        if k not in self._multi_cache:
            if self.shards is not None:
                sharded_fn = self._sharded_fn

                def scan_fn(s, *args):
                    return jax.lax.scan(
                        lambda carry, _: sharded_fn(carry, *args),
                        s, None, length=k,
                    )

                jitted = jax.jit(scan_fn)
                self._multi_cache[k] = (
                    lambda s: jitted(s, *self._sharded_args)
                )
            else:
                step_fn = self.step_fn

                def scan_fn(s, c):
                    return jax.lax.scan(
                        lambda carry, _: step_fn(carry, c), s, None, length=k
                    )

                jitted = jax.jit(scan_fn)
                self._multi_cache[k] = lambda s: jitted(s, self.consts)
        return self._multi_cache[k](state)

    def run_device(
        self,
        state: ADMMState,
        *,
        cap: int,
        dt_tol: float,
        target_ih: float | None = None,
        min_steps: int = 0,
        stop_on_rise: bool = False,
    ):
        """The WHOLE outer time loop as one device program
        (``integrators.device_loop``): steps until the reference's
        ``|dIh/dt| < DtTol`` stop (or the optional ``target_ih`` energy,
        armed from ``min_steps``), at most ``cap`` steps. One dispatch
        per run — the fix for small configs where the per-dispatch tunnel
        round-trip dominated (VERDICT r3 item 2). Returns
        ``(state', ih_trace[cap] f64 — NaN beyond steps, steps i32)``."""
        cap = int(cap)
        if cap not in self._run_cache:
            from .device_loop import build_run_loop

            if self.shards is None:
                step_fn = self.step_fn

                def step2(s, c):
                    s2, info = step_fn(s, c)
                    return s2, info.ih_start

                run = jax.jit(build_run_loop(step2, self.dt, cap))
                self._run_cache[cap] = (
                    lambda s, *a: run(s, self.consts, *a)
                )
            else:
                sharded_fn = self._sharded_fn

                def step2(s, args):
                    s2, info = sharded_fn(s, *args)
                    return s2, info.ih_start

                run = jax.jit(build_run_loop(step2, self.dt, cap))
                self._run_cache[cap] = (
                    lambda s, *a: run(s, self._sharded_args, *a)
                )
        use = target_ih is not None
        return self._run_cache[cap](
            state,
            jnp.asarray(dt_tol, jnp.float64),
            jnp.asarray(target_ih if use else 0.0, jnp.float64),
            jnp.asarray(use),
            jnp.asarray(min_steps, jnp.int32),
            jnp.asarray(bool(stop_on_rise)),
        )

    def energy(self, state: ADMMState) -> float:
        """solver.getEnergy() (MeshIntegrator.cpp:79-81)."""
        return float(self.mesh.energy(state.x))

    def output_x(self, state: ADMMState, fname: str) -> str:
        """Debug dump of the node-position vector, one comma-separated
        point per line (``MeshIntegrator::outputX``,
        MeshIntegrator.cpp:219-232)."""
        import numpy as np

        np.savetxt(fname, np.asarray(state.x), delimiter=", ", fmt="%.17g")
        return fname

    def output_z(self, state: ADMMState, fname: str) -> str:
        """Debug dump of the element-stacked vertex vector z = D x, one
        comma-separated row per element-vertex slot
        (``MeshIntegrator::outputZ``, MeshIntegrator.cpp:234-246; rows =
        NF*(D+1) like the reference's z->rows()/D)."""
        import numpy as np

        z = np.asarray(self.mesh.gather(state.x))
        np.savetxt(
            fname, z.reshape(-1, self.mesh.dim), delimiter=", ",
            fmt="%.17g",
        )
        return fname

    def run(
        self,
        n_steps: int,
        dt_tol: float,
        state: ADMMState | None = None,
        verbose: bool = False,
        callback=None,
    ):
        """The outer time loop (main.cpp:176-211): step until
        |Ih - Ih_prev| / dt < dt_tol."""
        if state is None:
            state = self.init_state()
        ih_trace = [self.energy(state)]
        ih_prev = float("inf")
        for i in range(n_steps):
            state, info = self.step(state)
            ih = float(info.ih_start)
            ih_trace.append(ih)
            if callback is not None:
                callback(i, state, info)
            if verbose:
                print(
                    f"step {i}: Ih={ih:.8g} admm_iters={int(info.n_iters)} "
                    f"primal={float(info.primal):.3g} dual={float(info.dual):.3g}"
                )
            if i != 0 and abs((ih - ih_prev) / self.dt) < dt_tol:
                break
            ih_prev = ih
        return state, ih_trace
