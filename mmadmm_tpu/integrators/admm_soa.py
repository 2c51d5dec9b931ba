"""Channel-major (SoA) slab-streamed ADMM step — the 6.1M-tet tier path.

Why this exists: XLA:TPU tiles the minor two dimensions of every
materialized tensor to (8, 128). The standard step's element-major
layouts ([NF, 4, 3] gathers, [NF, 4, 8, 6] interpolation-cell blobs) pad
20-100x at 3DMonitor180/280 scale — the captured AOT compile error for
the stock path at 3DMonitor280 is a single f32[6144000,4,8,6]{T(8,128)}
temporary of 100 GB (``scripts/tpu_280_probe.py``). The reference runs
this tier in 25,290 s / 2,865 s single-thread
(``Data/3DMonitor1/Single3DMonitor180.json``,
``Data/3DMonitor2/Single3DMonitor280.json``); round 4 recorded the tier
as the one capability gap (VERDICT r4 missing item 1).

Design (same math as ``integrators/admm.py`` — predictor energy guard,
Ihstart semantics, residual stops, dual warm start; only the EXECUTION
layout differs):

* element-side state is CHUNKED CHANNEL-MAJOR: ``z, u [C, 12, S]``
  (channel = vertex*3 + coord, the Pallas kernel's native tile layout,
  pre-chunked so XLA never sees a transpose that tempts it into a
  12-minor layout — see the SoAState comment), node-side state is FLAT:
  ``x [NPp*3]`` node-major. Flat 1-D arrays pad nothing; the rank-3
  chunks pad only 12->16 sublanes (1.33x).
* every per-element stage streams through fixed-size slabs via
  ``lax.map`` (sequential), so any small-minor-dim temporary (the
  [S, 4, 8, 9] cell tensors, [S*4, 3] gather rows) is bounded by the
  slab, not the mesh: peak transient ~0.5 GB at the default slabs.
* the prox runs the round-4 component-form Pallas kernel per slab via
  ``prox_pallas3d``'s ``tiled_call`` — tiles are pure reshapes of the
  channel-major slabs, no element-major blob is ever built.
* the scatter (D^T) keeps the degree-padded dense-gather plan but
  streams NODE slabs and consumes a slot-major FLAT value vector
  ([NFp*12], built slab-wise), so its [Sn, K, 3] gather rows are bounded.

Scope: D=3, method 0, no computational mesh, symmetric-monitor cell
table or constant grid (i.e. the whole shipped 3DMonitor1/2 family).
Selected by ``build_problem`` when NF exceeds ``MMADMM_SOA_MIN``
(default 1.5M); ``MMADMM_SOA=1`` forces it for testing.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..mesh import MovingMesh
from ..ops import huang
from ..ops.monitor_grid import _cell_index
from ..ops.reductions import block_sum_f64, block_sumsq_f64
from .admm import StepInfo

_FULL9 = np.array([0, 1, 2, 1, 3, 4, 2, 4, 5], dtype=np.int32)


class SoAState(NamedTuple):
    x: jnp.ndarray       # [NPp*3] flat node-major
    x_prev: jnp.ndarray  # [NPp*3]
    # chunked channel-major dual [C, 12, S]: the CANONICAL element-side
    # layout. A flat [12, NFp] form was tried first and XLA materialized
    # it with a transposed {0,1} layout (12 minor -> (8,128) tiling pads
    # 10.7x = 2.94 GB per buffer at 6.1M tets — the queue-4 OOM); the
    # chunked rank-3 layout keeps S minor and pads only 12->16.
    u: jnp.ndarray
    steps: jnp.ndarray
    ih_last: jnp.ndarray
    rose: jnp.ndarray
    rises: jnp.ndarray


def _gather3(x1d: jnp.ndarray, starts: jnp.ndarray) -> jnp.ndarray:
    """[L] x [N] -> [N, 3]: one gather of N width-3 rows (slice_sizes=(3,))
    — the flat-operand form keeps both operand and output free of tile
    padding beyond the [N, 3] row block itself (bounded per slab)."""
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,)
    )
    return jax.lax.gather(
        x1d, starts[:, None].astype(jnp.int32), dnums, slice_sizes=(3,),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )


class SoAADMM3D:
    """Drop-in ADMM integrator (init_state/step/multi_step) for big 3D
    meshes. Mirrors ``ADMMIntegrator``'s single-device semantics."""

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
        slab: int | None = None,
        node_slab: int | None = None,
        grid_dims: tuple[int, int, int] | None = None,
    ):
        assert mesh.dim == 3 and not mesh.comp_mesh, (
            "SoAADMM3D: D=3 non-comp-mesh only"
        )
        grid = mesh.grid
        assert grid.constant or (
            grid.cell_table is not None and grid.cell_table.shape[-1] == 48
        ), "SoAADMM3D needs the symmetric cell table or a constant grid"
        self.mesh = mesh
        self.dt = float(dt)
        self.admm_iters = int(admm_iters)
        self.tol = float(tol)
        self.prox_tol = (
            float(prox_tol) if prox_tol is not None else self.tol / 100.0
        )
        self.prox_max_iters = int(prox_max_iters)
        self.grad_use = bool(grad_use)
        self.dtype = mesh.dtype

        NF, NP = mesh.n_elements, mesh.n_pnts

        # STENCIL mode (box meshes, SquareGrid/Shoulder — nodes never
        # compacted): replaces the two index-bound consensus ops (the
        # slot gather and the node-slab dense scatter, ~40% of the
        # 6.1M-tet iteration together) with window slices and shifted
        # pad-adds over the grid/centroid pages (ops/stencil3d.py).
        # Elements become the DENSE cell*12+t set (carved cells ride
        # dead); vertex swaps from reOrientElements become per-(cell, t)
        # select masks. MMADMM_SOA_STENCIL=0 disables.
        self.stencil = False
        if (
            grid_dims is not None
            and os.environ.get("MMADMM_SOA_STENCIL") != "0"
        ):
            gnx, gny, gnz = grid_dims
            NPg = (gnx + 1) * (gny + 1) * (gnz + 1)
            ncell = gnx * gny * gnz
            if NP == NPg + ncell:
                from ..ops.stencil3d import match_dense_3d

                try:
                    alive, swapped, m_of_d = match_dense_3d(
                        gnx, gny, gnz, mesh._F_np
                    )
                    self.stencil = True
                    self._st_dims = (gnx, gny, gnz, NPg, ncell)
                    self._st_match = (alive, swapped, m_of_d)
                except AssertionError:
                    self.stencil = False
        if self.stencil:
            self._init_stencil(mesh, slab)
            return
        S = int(slab or os.environ.get("MMADMM_SOA_SLAB", 131072))
        S = max(1024, (S // 1024) * 1024)
        S = min(S, -(-NF // 1024) * 1024)  # never pad past one slab
        C = -(-NF // S)
        NFp = C * S
        # grad-path slab (cell dicts are fatter): S/4 when that is still a
        # whole number of (8,128) tiles, else S — must divide NFp exactly
        Sg = S // 4 if (S // 4) % 1024 == 0 and S >= 4096 else S
        Cg = NFp // Sg
        Sn = int(node_slab or os.environ.get("MMADMM_SOA_NODE_SLAB", 16384))
        Cn = -(-NP // Sn)
        NPp = Cn * Sn
        self.S, self.C, self.NFp = S, C, NFp
        self.Sn, self.Cn, self.NPp = Sn, Cn, NPp
        self.Sg, self.Cg = Sg, Cg
        self.NF, self.NP = NF, NP

        # ---------------- host-side const construction ----------------
        F = mesh._F_np  # [NF, 4] int32
        # pad elements CLONE element 0 (finite geometry through the
        # kernel; free mask 0 keeps them at entry; sums are valid-masked)
        Fp = np.concatenate(
            [F, np.broadcast_to(F[:1], (NFp - NF, 4))]
        ).astype(np.int64)
        fstarts = (3 * Fp.reshape(-1)).astype(np.int32)  # [NFp*4]

        free = mesh._elem_free_np.reshape(NF, 12)  # slot-major (v, d)
        free_p = np.concatenate(
            [free, np.zeros((NFp - NF, 12))], axis=0
        ).astype(np.float32)
        valid = np.zeros(NFp, dtype=np.float32)
        valid[:NF] = 1.0

        from ..geometry.topology import dense_scatter_plan, node_degrees

        dense_idx, K = dense_scatter_plan(F, NP)  # [NP, K], sentinel NF*4
        self.K = K
        # starts into the slot-major flat value vector [NFp*12 (+3 pad)]
        dstarts = np.where(
            dense_idx < NF * 4, dense_idx.astype(np.int64) * 3, NFp * 12
        ).astype(np.int32)
        dstarts = np.concatenate(
            [dstarts,
             np.full((NPp - NP, K), NFp * 12, dtype=np.int32)], axis=0
        )

        deg = node_degrees(F, NP).astype(np.float64)
        tau, w = mesh.tau, mesh.w
        dt2w2 = self.dt * self.dt * w * w
        t_diag = tau + dt2w2 * deg
        t_flat = np.ones(NPp * 3, dtype=np.float64)
        t_flat[: NP * 3] = np.repeat(t_diag, 3)

        x0 = np.zeros(NPp * 3, dtype=np.float64)
        x0[: NP * 3] = np.asarray(mesh._X_np, dtype=np.float64).reshape(-1)

        dtype = self.dtype
        self._x0 = jnp.asarray(x0, dtype=dtype)
        self._consts = dict(
            fstarts=jnp.asarray(fstarts),
            free_chunks=jnp.asarray(
                free_p.T.reshape(12, C, S).transpose(1, 0, 2), dtype=dtype
            ),  # [C, 12, S]
            free_flat=jnp.asarray(free_p.reshape(-1), dtype=dtype),
            valid=jnp.asarray(valid, dtype=dtype),
            dstarts=jnp.asarray(dstarts.reshape(Cn, Sn * K)),
            t_flat=jnp.asarray(t_flat, dtype=dtype),
            axes=tuple(grid.axes),
            cell_table=(
                grid.cell_table if grid.cell_table is not None
                else jnp.zeros((1, 1), dtype=dtype)
            ),
        )
        self._grid_constant = bool(grid.constant)
        if self._grid_constant:
            flat0 = np.asarray(grid.values).reshape(-1, 9)[0]
            self._consts["sym6"] = jnp.asarray(
                flat0[[0, 1, 2, 4, 5, 8]], dtype=dtype
            )
            self._consts["vals0_9"] = jnp.asarray(flat0, dtype=dtype)

        self.tau, self.w, self.dt2w2 = float(tau), float(w), float(dt2w2)
        self.ehat = mesh.ehat

        # the component-form Pallas kernel, entered through tiled_call
        from ..ops.prox_pallas3d import make_prox_pallas3d

        interp = jax.default_backend() not in ("tpu", "axon")
        self._kernel = make_prox_pallas3d(
            self.ehat, self.w, comp_mesh=False, interpret=interp
        )

        self.step_fn = self._build_step()
        self._step_jit = jax.jit(self.step_fn)
        self._multi_cache: dict[int, object] = {}
        self._run_cache: dict[int, object] = {}

    # ------------------------------------------------------------------
    def _init_stencil(self, mesh: MovingMesh, slab):
        """Stencil-mode construction: dense element universe, [3, NP]
        node state, no gather/scatter plans."""
        gnx, gny, gnz, NPg, ncell = self._st_dims
        alive, swapped, m_of_d = self._st_match
        NP = mesh.n_pnts
        NFd = 12 * ncell
        S = int(slab or os.environ.get("MMADMM_SOA_SLAB", 131072))
        S = max(1024, (S // 1024) * 1024)
        S = min(S, -(-NFd // 1024) * 1024)
        C = -(-NFd // S)
        NFp = C * S
        Sg = S // 4 if (S // 4) % 1024 == 0 and S >= 4096 else S
        Cg = NFp // Sg
        self.S, self.C, self.NFp = S, C, NFp
        self.Sg, self.Cg = Sg, Cg
        self.NF, self.NP = NFd, NP
        self.NFd = NFd
        dtype = self.dtype
        grid = mesh.grid

        free_m = mesh._elem_free_np.reshape(mesh.n_elements, 12)
        free_d = np.zeros((NFd, 12))
        free_d[alive] = free_m[m_of_d[alive]]
        free_p = np.concatenate(
            [free_d, np.zeros((NFp - NFd, 12))], axis=0
        ).astype(np.float32)
        valid = np.zeros(NFp, dtype=np.float32)
        valid[:NFd] = alive.astype(np.float32)

        from ..geometry.topology import node_degrees

        deg = node_degrees(
            np.asarray(mesh._F_np), NP
        ).astype(np.float64)
        tau, w = mesh.tau, mesh.w
        dt2w2 = self.dt * self.dt * w * w
        t_node = tau + dt2w2 * deg  # [NP]

        def planes_t(v):  # [NFd] -> [12, ncell]
            return v.reshape(ncell, 12).T.copy()

        self._x0 = jnp.asarray(
            np.asarray(mesh._X_np, dtype=np.float64).T, dtype=dtype
        )  # [3, NP]
        self._consts = dict(
            swap_t=jnp.asarray(
                planes_t(swapped.astype(np.float64)), dtype=dtype
            ),
            alive_t=jnp.asarray(
                planes_t(alive.astype(np.float64)), dtype=dtype
            ),
            free_chunks=jnp.asarray(
                free_p.T.reshape(12, C, S).transpose(1, 0, 2),
                dtype=dtype,
            ),
            free_flat=jnp.asarray(free_p.reshape(-1), dtype=dtype),
            valid=jnp.asarray(valid, dtype=dtype),
            t_node=jnp.asarray(t_node, dtype=dtype),
            axes=tuple(grid.axes),
            cell_table=(
                grid.cell_table if grid.cell_table is not None
                else jnp.zeros((1, 1), dtype=dtype)
            ),
        )
        self._grid_constant = bool(grid.constant)
        if self._grid_constant:
            flat0 = np.asarray(grid.values).reshape(-1, 9)[0]
            self._consts["sym6"] = jnp.asarray(
                flat0[[0, 1, 2, 4, 5, 8]], dtype=dtype
            )
            self._consts["vals0_9"] = jnp.asarray(flat0, dtype=dtype)

        self.tau, self.w, self.dt2w2 = float(tau), float(w), float(dt2w2)
        self.ehat = mesh.ehat

        from ..ops.prox_pallas3d import make_prox_pallas3d

        interp = jax.default_backend() not in ("tpu", "axon")
        self._kernel = make_prox_pallas3d(
            self.ehat, self.w, comp_mesh=False, interpret=interp
        )
        self.step_fn = self._build_step_stencil()
        self._step_jit = jax.jit(self.step_fn)
        self._multi_cache: dict[int, object] = {}
        self._run_cache: dict[int, object] = {}

    # ------------------------------------------------------------------
    def init_state(self) -> SoAState:
        return SoAState(
            x=self._x0,
            x_prev=self._x0,
            u=jnp.zeros((self.C, 12, self.S), dtype=self.dtype),
            steps=jnp.zeros((), jnp.int32),
            ih_last=jnp.asarray(jnp.inf, jnp.float64),
            rose=jnp.zeros((), bool),
            rises=jnp.zeros((), jnp.int32),
        )

    # ------------------------------------------------------------------
    def _build_step(self):
        S, C, NFp = self.S, self.C, self.NFp
        Sg, Cg = self.Sg, self.Cg
        Sn, Cn, NPp = self.Sn, self.Cn, self.NPp
        K = self.K
        tau, dt2w2, dt = self.tau, self.dt2w2, self.dt
        tol, prox_tol = self.tol, self.prox_tol
        n_iters, prox_iters = self.admm_iters, self.prox_max_iters
        Tc = S // 1024
        tiled_call = self._kernel.tiled_call
        ehat = self.ehat
        constant = self._grid_constant
        grad_use = self.grad_use
        dtype = self.dtype

        def gather12(x1d, c):
            """x [NPp*3] -> z [C, 12, S] chunked channel-major."""
            starts = c["fstarts"].reshape(C, S * 4)

            def body(st):
                rows = _gather3(x1d, st)              # [S*4, 3]
                return rows.reshape(S, 12).T          # [12, S]

            return jax.lax.map(body, starts)           # [C, 12, S]

        def to_slot_flat(y12):
            """[C, 12, S] chunked channel-major -> [NFp*12] slot-major."""
            def body(chunk):                           # [12, S]
                return chunk.T.reshape(S * 12)

            out = jax.lax.map(body, y12)               # [C, S*12]
            return out.reshape(NFp * 12)

        def scatter_flat(y_flat, c):
            """slot-major [NFp*12] -> node-major [NPp*3] (D^T apply)."""
            y_pad = jnp.concatenate(
                [y_flat, jnp.zeros((3,), dtype=y_flat.dtype)]
            )

            def body(st):                              # [Sn*K]
                rows = _gather3(y_pad, st)             # [Sn*K, 3]
                part = rows.reshape(Sn, K, 3).sum(axis=1)  # [Sn, 3]
                return part.reshape(Sn * 3)

            out = jax.lax.map(body, c["dstarts"])      # [Cn, Sn*3]
            return out.reshape(NPp * 3)

        def scatter12(y12, c):
            return scatter_flat(to_slot_flat(y12), c)

        def x_update(x_bar, z12, u12, c):
            rhs = tau * x_bar + dt2w2 * scatter12(z12 - u12, c)
            return rhs / c["t_flat"]

        def cell_channels(chunk, c):
            """Per-vertex cell rows for one prox slab: [216, S] channel-
            major (48 corner entries + 6 bounds per vertex, vertex-major)
            — same row layout as prox_pallas3d._cell_rows, built without
            any [S, 4, *] intermediate."""
            ax, ay, az = c["axes"]
            n = ax.shape[0] - 1
            parts = []
            for v in range(4):
                xs, ys, zs = chunk[3 * v], chunk[3 * v + 1], chunk[3 * v + 2]
                xi = _cell_index(xs, ax)
                yi = _cell_index(ys, ay)
                zi = _cell_index(zs, az)
                if constant:
                    vals48 = jnp.broadcast_to(
                        jnp.tile(c["sym6"], 8)[:, None], (48, S)
                    )
                else:
                    ci = (zi * n + yi) * n + xi
                    vals48 = c["cell_table"][ci].T  # [48, S]
                bounds = jnp.stack(
                    [ax[xi], ax[xi + 1], ay[yi], ay[yi + 1],
                     az[zi], az[zi + 1]]
                )                                      # [6, S]
                parts.append(
                    jnp.concatenate([vals48, bounds.astype(chunk.dtype)])
                )
            return jnp.concatenate(parts)              # [216, S]

        def prox12(z12, dxpu12, c):
            """Slab-streamed Pallas prox: [C, 12, S] -> (z', ih0 [C, S])."""
            def body(args):
                z_c, d_c, f_c = args                   # [12, S] each
                cells = cell_channels(z_c, c).reshape(216, Tc, 8, 128)
                zo, ih0 = tiled_call(
                    z_c.reshape(12, Tc, 8, 128),
                    d_c.reshape(12, Tc, 8, 128),
                    f_c.reshape(12, Tc, 8, 128),
                    cells, prox_tol, prox_iters,
                )
                return zo.reshape(12, S), ih0.reshape(S)

            return jax.lax.map(body, (z12, dxpu12, c["free_chunks"]))

        def cells_dict(z_c, c):
            """gather_cell-compatible cells pytree for one grad slab:
            leaves vals [Sg, 4, 8, 9] + bounds [Sg, 4] (bounded blobs)."""
            ax, ay, az = c["axes"]
            n = ax.shape[0] - 1
            full = jnp.asarray(_FULL9)
            vals_v, b = [], {k: [] for k in
                            ("x0", "x1", "y0", "y1", "z0", "z1")}
            for v in range(4):
                xs, ys, zs = z_c[:, v, 0], z_c[:, v, 1], z_c[:, v, 2]
                xi = _cell_index(xs, ax)
                yi = _cell_index(ys, ay)
                zi = _cell_index(zs, az)
                if constant:
                    vals = jnp.broadcast_to(
                        c["vals0_9"][None, None, :], (Sg, 8, 9)
                    )
                else:
                    ci = (zi * n + yi) * n + xi
                    v6 = c["cell_table"][ci].reshape(Sg, 8, 6)
                    vals = v6[:, :, full]              # [Sg, 8, 9]
                vals_v.append(vals)
                for key, val in zip(
                    ("x0", "x1", "y0", "y1", "z0", "z1"),
                    (ax[xi], ax[xi + 1], ay[yi], ay[yi + 1],
                     az[zi], az[zi + 1]),
                ):
                    b[key].append(val)
            return dict(
                vals=jnp.stack(vals_v, axis=1),        # [Sg, 4, 8, 9]
                **{k: jnp.stack(v, axis=1) for k, v in b.items()},
            )

        xi_dummy = jnp.zeros((4, 3), dtype=dtype)

        def eg_one(z_e, cells_e):
            return huang.element_energy_grad(
                z_e, xi_dummy, None, ehat, False, cells=cells_e
            )

        def grad_full(x1d, c):
            """Free-masked assembled gradient [NPp*3] (predictor euler,
            Mesh::eulerGrad semantics), slab-streamed."""
            starts = c["fstarts"].reshape(Cg, Sg * 4)
            free_g = c["free_flat"].reshape(Cg, Sg, 12)

            def body(args):
                st, fr = args
                rows = _gather3(x1d, st)               # [Sg*4, 3]
                z_c = rows.reshape(Sg, 4, 3)
                cells = cells_dict(z_c, c)
                _, g_e = jax.vmap(eg_one)(z_c, cells)  # [Sg, 4, 3]
                g_m = g_e.reshape(Sg, 12) * fr
                return g_m.reshape(Sg * 12)

            g_flat = jax.lax.map(body, (starts, free_g))  # [Cg, Sg*12]
            return scatter_flat(g_flat.reshape(NFp * 12), c)

        def step(state: SoAState, c: dict):
            x, x_prev, u, steps, ih_last, rose, rises = state

            def euler(_):
                return x - (dt / tau) * grad_full(x, c)

            def extrap(_):
                return 2.0 * x - x_prev

            def damped(_):
                return jax.lax.cond(rises >= 2, lambda _: x, euler, None)

            if grad_use:
                x_bar = euler(None)
            else:
                x_bar = jax.lax.cond(
                    steps <= 2, euler,
                    lambda _: jax.lax.cond(rose, damped, extrap, None),
                    None,
                )

            x_prev2 = x
            x = x_bar
            z = jax.lax.cond(
                steps == 0,
                lambda _: gather12(x_prev2, c),
                lambda _: gather12(x, c),
                None,
            )
            u = jnp.where(steps == 0, jnp.zeros_like(u), u)
            x = x_update(x_bar, z, u, c)

            valid_cs = c["valid"].reshape(C, S)

            def msum(a_cs):  # [C, 12, S]
                return block_sumsq_f64(a_cs * valid_cs[:, None, :])

            def cond_fn(carry):
                i, done, *_ = carry
                return jnp.logical_and(i < n_iters, ~done)

            def body_fn(carry):
                i, _, x, gx, z, u, ih_start, primal, dual = carry
                dxpu = gx + u
                z_prev = z
                z, ih0 = prox12(z, dxpu, c)  # ih0 [C, S]
                ih_cur = block_sum_f64(
                    jnp.where(valid_cs > 0, ih0, 0.0)
                )
                ih_start = jnp.where(i == 0, ih_cur, ih_start)
                u = dxpu - z
                x = x_update(x_bar, z, u, c)
                gx = gather12(x, c)
                primal = jnp.sqrt(msum(gx - z))
                dual = jnp.sqrt(msum(z - z_prev))
                done = jnp.logical_and(primal < tol, dual < tol)
                return (i + 1, done, x, gx, z, u, ih_start, primal, dual)

            init = (
                jnp.zeros((), jnp.int32), jnp.zeros((), bool),
                x, gather12(x, c), z, u,
                jnp.zeros((), jnp.float64), jnp.zeros((), jnp.float64),
                jnp.zeros((), jnp.float64),
            )
            (i, _, x, _, z, u, ih_start, primal,
             dual) = jax.lax.while_loop(cond_fn, body_fn, init)

            rose_next = ih_start > ih_last
            rises_next = jnp.where(ih_start > ih_last, rises + 1, 0)
            new_state = SoAState(
                x=x, x_prev=x_prev2, u=u, steps=steps + 1,
                ih_last=ih_start, rose=rose_next, rises=rises_next,
            )
            return new_state, StepInfo(
                ih_start=ih_start, primal=primal, dual=dual, n_iters=i
            )

        return step

    # ------------------------------------------------------------------
    def _build_step_stencil(self):
        """Stencil-mode step: same semantics, consensus ops as window
        slices / shifted pad-adds, node state [3, NP] d-major."""
        from ..ops.stencil3d import make_stencil_ops_3d

        gnx, gny, gnz, NPg, ncell = self._st_dims
        S, C, NFp = self.S, self.C, self.NFp
        Sg, Cg = self.Sg, self.Cg
        NFd = self.NFd
        tau, dt2w2, dt = self.tau, self.dt2w2, self.dt
        tol, prox_tol = self.tol, self.prox_tol
        n_iters, prox_iters = self.admm_iters, self.prox_max_iters
        Tc = S // 1024
        tiled_call = self._kernel.tiled_call
        ehat = self.ehat
        constant = self._grid_constant
        grad_use = self.grad_use
        dtype = self.dtype
        pad = NFp - NFd

        gather_ch, scatter_ch = make_stencil_ops_3d(gnx, gny, gnz)

        def channels_of(x3, c):
            chans = gather_ch(x3[:, :NPg], x3[:, NPg:], c["swap_t"])
            if pad:
                chans = [
                    jnp.concatenate([ch, ch[:pad]]) for ch in chans
                ]
            return chans

        def chunked(chans, size, count):
            def chunk(ci):
                return jnp.stack([
                    jax.lax.dynamic_slice(ch, (ci * size,), (size,))
                    for ch in chans
                ])

            return jax.lax.map(chunk, jnp.arange(count))

        def gather12(x3, c):
            return chunked(channels_of(x3, c), S, C)  # [C, 12, S]

        def scatter12(y, c):
            """[C, 12, S] -> [3, NP] via shifted pad-adds."""
            chans = [y[:, i, :].reshape(NFp)[:NFd] for i in range(12)]
            sg, sm = scatter_ch(chans, c["swap_t"], c["alive_t"])
            return jnp.concatenate([sg, sm], axis=1)

        def x_update(x_bar, z12, u12, c):
            rhs = tau * x_bar + dt2w2 * scatter12(z12 - u12, c)
            return rhs / c["t_node"][None, :]

        def cell_channels(chunk, c):
            ax, ay, az = c["axes"]
            n = ax.shape[0] - 1
            parts = []
            for v in range(4):
                xs, ys, zs = chunk[3 * v], chunk[3 * v + 1], chunk[3 * v + 2]
                xi = _cell_index(xs, ax)
                yi = _cell_index(ys, ay)
                zi = _cell_index(zs, az)
                if constant:
                    vals48 = jnp.broadcast_to(
                        jnp.tile(c["sym6"], 8)[:, None], (48, S)
                    )
                else:
                    ci = (zi * n + yi) * n + xi
                    vals48 = c["cell_table"][ci].T
                bounds = jnp.stack(
                    [ax[xi], ax[xi + 1], ay[yi], ay[yi + 1],
                     az[zi], az[zi + 1]]
                )
                parts.append(
                    jnp.concatenate([vals48, bounds.astype(chunk.dtype)])
                )
            return jnp.concatenate(parts)

        def prox12(z12, dxpu12, c):
            def body(args):
                z_c, d_c, f_c = args
                cells = cell_channels(z_c, c).reshape(216, Tc, 8, 128)
                zo, ih0 = tiled_call(
                    z_c.reshape(12, Tc, 8, 128),
                    d_c.reshape(12, Tc, 8, 128),
                    f_c.reshape(12, Tc, 8, 128),
                    cells, prox_tol, prox_iters,
                )
                return zo.reshape(12, S), ih0.reshape(S)

            return jax.lax.map(body, (z12, dxpu12, c["free_chunks"]))

        def cells_dict(z_c, c):
            ax, ay, az = c["axes"]
            n = ax.shape[0] - 1
            full = jnp.asarray(_FULL9)
            vals_v, b = [], {k: [] for k in
                            ("x0", "x1", "y0", "y1", "z0", "z1")}
            for v in range(4):
                xs, ys, zs = z_c[:, v, 0], z_c[:, v, 1], z_c[:, v, 2]
                xi = _cell_index(xs, ax)
                yi = _cell_index(ys, ay)
                zi = _cell_index(zs, az)
                if constant:
                    vals = jnp.broadcast_to(
                        c["vals0_9"][None, None, :], (Sg, 8, 9)
                    )
                else:
                    ci = (zi * n + yi) * n + xi
                    v6 = c["cell_table"][ci].reshape(Sg, 8, 6)
                    vals = v6[:, :, full]
                vals_v.append(vals)
                for key, val in zip(
                    ("x0", "x1", "y0", "y1", "z0", "z1"),
                    (ax[xi], ax[xi + 1], ay[yi], ay[yi + 1],
                     az[zi], az[zi + 1]),
                ):
                    b[key].append(val)
            return dict(
                vals=jnp.stack(vals_v, axis=1),
                **{k: jnp.stack(v, axis=1) for k, v in b.items()},
            )

        xi_dummy = jnp.zeros((4, 3), dtype=dtype)

        def eg_one(z_e, cells_e):
            return huang.element_energy_grad(
                z_e, xi_dummy, None, ehat, False, cells=cells_e
            )

        def grad_full(x3, c):
            """Predictor euler gradient [3, NP]: stencil gather, vmapped
            element grads in Sg slabs, stencil scatter."""
            chans = channels_of(x3, c)
            zc_g = chunked(chans, Sg, Cg)            # [Cg, 12, Sg]
            free_g = c["free_flat"].reshape(Cg, Sg, 12)

            def body(args):
                z_c, fr = args                        # [12, Sg], [Sg, 12]
                z_e = z_c.T.reshape(Sg, 4, 3)
                cells = cells_dict(z_e, c)
                _, g_e = jax.vmap(eg_one)(z_e, cells)
                return (g_e.reshape(Sg, 12) * fr).T   # [12, Sg]

            g_chunks = jax.lax.map(body, (zc_g, free_g))  # [Cg, 12, Sg]
            g_ch = [
                g_chunks[:, i, :].reshape(NFp)[:NFd] for i in range(12)
            ]
            sg, sm = scatter_ch(g_ch, c["swap_t"], c["alive_t"])
            return jnp.concatenate([sg, sm], axis=1)

        def step(state: SoAState, c: dict):
            x, x_prev, u, steps, ih_last, rose, rises = state

            def euler(_):
                return x - (dt / tau) * grad_full(x, c)

            def extrap(_):
                return 2.0 * x - x_prev

            def damped(_):
                return jax.lax.cond(rises >= 2, lambda _: x, euler, None)

            if grad_use:
                x_bar = euler(None)
            else:
                x_bar = jax.lax.cond(
                    steps <= 2, euler,
                    lambda _: jax.lax.cond(rose, damped, extrap, None),
                    None,
                )

            x_prev2 = x
            x = x_bar
            z = jax.lax.cond(
                steps == 0,
                lambda _: gather12(x_prev2, c),
                lambda _: gather12(x, c),
                None,
            )
            u = jnp.where(steps == 0, jnp.zeros_like(u), u)
            x = x_update(x_bar, z, u, c)

            valid_cs = c["valid"].reshape(C, S)

            def msum(a_cs):
                return block_sumsq_f64(a_cs * valid_cs[:, None, :])

            def cond_fn(carry):
                i, done, *_ = carry
                return jnp.logical_and(i < n_iters, ~done)

            def body_fn(carry):
                i, _, x, gx, z, u, ih_start, primal, dual = carry
                dxpu = gx + u
                z_prev = z
                z, ih0 = prox12(z, dxpu, c)
                ih_cur = block_sum_f64(
                    jnp.where(valid_cs > 0, ih0, 0.0)
                )
                ih_start = jnp.where(i == 0, ih_cur, ih_start)
                u = dxpu - z
                x = x_update(x_bar, z, u, c)
                gx = gather12(x, c)
                primal = jnp.sqrt(msum(gx - z))
                dual = jnp.sqrt(msum(z - z_prev))
                done = jnp.logical_and(primal < tol, dual < tol)
                return (i + 1, done, x, gx, z, u, ih_start, primal, dual)

            init = (
                jnp.zeros((), jnp.int32), jnp.zeros((), bool),
                x, gather12(x, c), z, u,
                jnp.zeros((), jnp.float64), jnp.zeros((), jnp.float64),
                jnp.zeros((), jnp.float64),
            )
            (i, _, x, _, z, u, ih_start, primal,
             dual) = jax.lax.while_loop(cond_fn, body_fn, init)

            rose_next = ih_start > ih_last
            rises_next = jnp.where(ih_start > ih_last, rises + 1, 0)
            new_state = SoAState(
                x=x, x_prev=x_prev2, u=u, steps=steps + 1,
                ih_last=ih_start, rose=rose_next, rises=rises_next,
            )
            return new_state, StepInfo(
                ih_start=ih_start, primal=primal, dual=dual, n_iters=i
            )

        return step

    # ------------------------------------------------------------------
    def step(self, state: SoAState):
        return self._step_jit(state, self._consts)

    def multi_step(self, state: SoAState, k: int):
        k = int(k)
        if k not in self._multi_cache:
            step_fn = self.step_fn

            def scan_fn(s, c):
                return jax.lax.scan(
                    lambda carry, _: step_fn(carry, c), s, None, length=k
                )

            jitted = jax.jit(scan_fn)
            self._multi_cache[k] = lambda s: jitted(s, self._consts)
        return self._multi_cache[k](state)

    def run_device(self, state, *, cap, dt_tol, target_ih=None,
                   min_steps=0, stop_on_rise=False):
        """Whole-run device loop (same contract as ADMMIntegrator) — for
        the SoA tier this is only used on hardware where multi-second
        dispatches are safe; the bench uses the chunked host loop."""
        cap = int(cap)
        if cap not in self._run_cache:
            from .device_loop import build_run_loop

            step_fn = self.step_fn

            def step2(s, c):
                s2, info = step_fn(s, c)
                return s2, info.ih_start

            run = jax.jit(build_run_loop(step2, self.dt, cap))
            self._run_cache[cap] = lambda s, *a: run(s, self._consts, *a)
        use = target_ih is not None
        return self._run_cache[cap](
            state,
            jnp.asarray(dt_tol, jnp.float64),
            jnp.asarray(target_ih if use else 0.0, jnp.float64),
            jnp.asarray(use),
            jnp.asarray(min_steps, jnp.int32),
            jnp.asarray(bool(stop_on_rise)),
        )

    def node_positions(self, state: SoAState) -> np.ndarray:
        if self.stencil:  # [3, NP] d-major
            return np.asarray(state.x).T.copy()
        return np.asarray(
            state.x[: self.NP * 3]
        ).reshape(self.NP, 3)

    def energy(self, state: SoAState) -> float:
        x = self.node_positions(state)
        return float(self.mesh.energy(jnp.asarray(x, dtype=self.dtype)))
