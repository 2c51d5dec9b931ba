"""Structured-grid (stencil) ADMM engine for 2D SquareGrid/Shoulder meshes.

The round-4 roofline (COVERAGE.md) showed the ADMM iteration is ~2/3
gather/scatter INDEX processing: on this TPU every gather costs ~140M
index-rows/s regardless of row width, so `D x` (921,600 rows at
Monitor1320) and `D^T y` (NP*K rows) are a hard ~18 ms/iteration floor
that no fusion removes. But the headline family's meshes are STRUCTURED:
``generateUniformRectMesh`` builds (nx+1)*(ny+1) grid nodes + nx*ny cell
midpoints and splits each cell into 4 triangles with a fixed pattern
(``MeshUtils.h:104-155``), and the Shoulder carve drops elements WITHOUT
compacting nodes (``main.cpp:519-607``) — so element<->node incidence is
a STENCIL. This engine replaces both index ops with shifted-slice
arithmetic:

* ``D x``  = window slices of the grid/midpoint pages (zero gathers),
* ``D^T y`` = 4 shifted pad-adds into the grid page + one midpoint add
  (zero scatters),

leaving only the monitor cell-table fetch (data-dependent by nature) as
an index op. The per-element state (z, u) lives directly in the Pallas
kernel's tile layout [6, T, 8, 128]; carved cells ride along as DEAD
elements (valid=0, free=0 — their tiles early-exit in the kernel and
their node contributions are masked out), which costs ~NFd/NF extra
kernel lanes but removes the index bottleneck entirely.

Vertex-order fixups from ``reOrientElements`` (v1<->v2 swap on
negative-det triangles, data-dependent after the Shoulder perturbation)
are handled by per-(cell,k) swap masks derived from the actual mesh F at
setup, so kernel inputs are BIT-IDENTICAL to the compact AoS path.

Scope: D=2, method 0, no comp mesh, symmetric 16-wide cell table,
4*nx*ny divisible by 1024 (every shipped config). Selected by
``build_problem`` for big structured 2D meshes; MMADMM_GRID2D=0/1
overrides.
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

# canonical cell split (MeshUtils.h:128-153): per triangle k, the vertex
# sources among (bl, br, tl, tr, mid)
_VMAP = {
    0: ("bl", "M", "tl"),   # Left
    1: ("M", "tr", "tl"),   # Top
    2: ("M", "tr", "br"),   # Right
    3: ("bl", "br", "M"),   # Bottom
}


class Grid2DState(NamedTuple):
    x: jnp.ndarray       # [NP, 2]
    x_prev: jnp.ndarray
    u: jnp.ndarray       # [6, T, 8, 128] tile-layout dual
    steps: jnp.ndarray
    ih_last: jnp.ndarray
    rose: jnp.ndarray
    rises: jnp.ndarray


def _canonical_dense(nx: int, ny: int):
    """Canonical (pre-reorient) dense F for the uniform rect mesh."""
    stride = (nx + 1) * (ny + 1)
    ii, jj = np.meshgrid(np.arange(nx), np.arange(ny), indexing="xy")
    ii = ii.ravel()
    jj = jj.ravel()
    bl = ii + jj * (nx + 1)
    br = ii + 1 + jj * (nx + 1)
    tl = ii + (jj + 1) * (nx + 1)
    tr = ii + 1 + (jj + 1) * (nx + 1)
    mid = stride + ii + jj * nx
    ncell = nx * ny
    F = np.empty((4 * ncell, 3), dtype=np.int64)
    F[0::4] = np.stack([bl, mid, tl], axis=1)
    F[1::4] = np.stack([mid, tr, tl], axis=1)
    F[2::4] = np.stack([mid, tr, br], axis=1)
    F[3::4] = np.stack([bl, br, mid], axis=1)
    return F


class GridADMM2D:
    """Drop-in single-device ADMM integrator on the stencil engine."""

    def __init__(
        self,
        mesh: MovingMesh,
        dt: float,
        nx: int,
        ny: int,
        *,
        admm_iters: int = 10,
        tol: float = 1e-3,
        prox_tol: float | None = None,
        prox_max_iters: int = 50,
        grad_use: bool = False,
    ):
        assert mesh.dim == 2 and not mesh.comp_mesh
        grid = mesh.grid
        assert (
            grid.cell_table is not None
            and grid.cell_table.shape[-1] == 16
            and not grid.constant
        ), "GridADMM2D needs the symmetric 16-wide cell table"
        NP = mesh.n_pnts
        stride = (nx + 1) * (ny + 1)
        assert NP == stride + nx * ny, (
            "node layout is not the uncompacted rect grid"
        )
        NFd = 4 * nx * ny
        assert NFd % 1024 == 0, "dense element count must tile (8,128)"
        self.mesh = mesh
        self.dt = float(dt)
        self.admm_iters = int(admm_iters)
        self.tol = float(tol)
        self.prox_tol = (
            float(prox_tol) if prox_tol is not None else self.tol / 100.0
        )
        self.prox_max_iters = int(prox_max_iters)
        self.grad_use = bool(grad_use)
        self.nx, self.ny, self.NP, self.NFd = nx, ny, NP, NFd
        self.stride = stride
        self.T = NFd // 1024
        dtype = self.dtype = mesh.dtype

        # ---- match the mesh's compact F to the dense canonical order ----
        Fc = _canonical_dense(nx, ny)           # [NFd, 3]
        Fm = np.asarray(mesh._F_np, dtype=np.int64)  # [NF, 3], order kept
        keys_c = np.sort(Fc, axis=1)
        keys_m = np.sort(Fm, axis=1)
        alive = np.zeros(NFd, dtype=bool)
        swapped = np.zeros(NFd, dtype=bool)
        mesh_of_dense = np.full(NFd, -1, dtype=np.int64)
        mi = 0
        NF = Fm.shape[0]
        for e in range(NFd):
            if mi < NF and np.array_equal(keys_c[e], keys_m[mi]):
                alive[e] = True
                mesh_of_dense[e] = mi
                if not np.array_equal(Fc[e], Fm[mi]):
                    # reOrientElements only ever swaps vertices 1 and 2
                    assert np.array_equal(
                        Fc[e][[0, 2, 1]], Fm[mi]
                    ), f"unexpected vertex permutation at element {mi}"
                    swapped[e] = True
                mi += 1
        assert mi == NF, (
            f"dense/compact element matching failed ({mi} of {NF})"
        )
        self.NF = NF

        # per-(k) cell planes [ny, nx]
        def planes(v):
            return v.reshape(ny, nx, 4).transpose(2, 0, 1)  # [4, ny, nx]

        alive_k = planes(alive.astype(np.float64))
        swap_k = planes(swapped.astype(np.float64))

        # free mask in tile layout: dense slots of live elements take the
        # mesh's elem_free; dead elements are fully frozen
        free_m = mesh._elem_free_np.reshape(NF, 6)
        free_d = np.zeros((NFd, 6))
        free_d[alive] = free_m[mesh_of_dense[alive]]
        valid_d = alive.astype(np.float64)

        from ..geometry.topology import node_degrees

        deg = node_degrees(np.asarray(mesh._F_np), NP).astype(np.float64)
        tau, w = mesh.tau, mesh.w
        dt2w2 = self.dt * self.dt * w * w
        t_diag = tau + dt2w2 * deg

        def tiles(a2d):  # [NFd, C] -> [C, T, 8, 128]
            return jnp.asarray(
                a2d.T.reshape(a2d.shape[1], self.T, 8, 128), dtype=dtype
            )

        self._consts = dict(
            swap_k=jnp.asarray(swap_k, dtype=dtype),
            alive_k=jnp.asarray(alive_k, dtype=dtype),
            free_t=tiles(free_d),
            valid_t=jnp.asarray(
                valid_d.reshape(self.T, 8, 128), dtype=dtype
            ),
            t_diag=jnp.asarray(t_diag, dtype=dtype),
            cell_table=grid.cell_table,
            axes=tuple(grid.axes),
            # compact-path consts for the predictor's euler gradient
            F=mesh.F,
            dense_idx=mesh.dense_idx,
            elem_free=mesh.elem_free,
            xi=mesh.xi,
            grid=mesh.grid,
        )
        self.tau, self.w, self.dt2w2 = float(tau), float(w), float(dt2w2)

        from ..ops.prox_pallas2d import make_prox_pallas2d

        interp = jax.default_backend() not in ("tpu", "axon")
        self._kernel = make_prox_pallas2d(
            mesh.ehat, mesh.w, interpret=interp
        )
        self.step_fn = self._build_step()
        self._step_jit = jax.jit(self.step_fn)
        self._multi_cache: dict[int, object] = {}
        self._run_cache: dict[int, object] = {}

    # ------------------------------------------------------------------
    def init_state(self) -> Grid2DState:
        return Grid2DState(
            x=self.mesh.X0,
            x_prev=self.mesh.X0,
            u=jnp.zeros((6, self.T, 8, 128), dtype=self.dtype),
            steps=jnp.zeros((), jnp.int32),
            ih_last=jnp.asarray(jnp.inf, jnp.float64),
            rose=jnp.zeros((), bool),
            rises=jnp.zeros((), jnp.int32),
        )

    # ------------------------------------------------------------------
    def _build_step(self):
        nx, ny, NP, NFd, T = self.nx, self.ny, self.NP, self.NFd, self.T
        stride = self.stride
        tau, dt2w2, dt = self.tau, self.dt2w2, self.dt
        tol, prox_tol = self.tol, self.prox_tol
        n_iters, prox_iters = self.admm_iters, self.prox_max_iters
        tiled_call = self._kernel.tiled_call
        grad_use = self.grad_use
        mesh = self.mesh

        def corner_planes(page):
            """Grid page [ny+1, nx+1] -> (bl, br, tl, tr) cell planes."""
            return (
                page[:-1, :-1], page[:-1, 1:], page[1:, :-1], page[1:, 1:]
            )

        def gather_t(x, c):
            """x [NP, 2] -> z tiles [6, T, 8, 128] via stencil slices."""
            chans = []
            for d in range(2):
                page = x[:stride, d].reshape(ny + 1, nx + 1)
                M = x[stride:, d].reshape(ny, nx)
                bl, br, tl, tr = corner_planes(page)
                src = dict(bl=bl, br=br, tl=tl, tr=tr, M=M)
                for v in range(3):
                    per_k = []
                    for k in range(4):
                        a = src[_VMAP[k][v]]
                        if v in (1, 2):
                            b = src[_VMAP[k][3 - v]]
                            sk = c["swap_k"][k]
                            a = sk * b + (1.0 - sk) * a
                        per_k.append(a)
                    # element index e = cell*4 + k -> stack k minor
                    ch = jnp.stack(per_k, axis=-1).reshape(NFd)
                    chans.append((v, d, ch))
            out = [None] * 6
            for v, d, ch in chans:
                out[v * 2 + d] = ch
            return jnp.stack(out).reshape(6, T, 8, 128)

        def scatter_t(y_t, c):
            """Tile values [6, T, 8, 128] -> node field [NP, 2] (D^T y,
            live elements only) via shifted pad-adds."""
            y = y_t.reshape(6, NFd)
            cols = []
            for d in range(2):
                acc = dict(
                    bl=jnp.zeros((ny, nx), y.dtype),
                    br=jnp.zeros((ny, nx), y.dtype),
                    tl=jnp.zeros((ny, nx), y.dtype),
                    tr=jnp.zeros((ny, nx), y.dtype),
                    M=jnp.zeros((ny, nx), y.dtype),
                )
                per_v_planes = [
                    y[v * 2 + d].reshape(ny, nx, 4) for v in range(3)
                ]
                for k in range(4):
                    av = c["alive_k"][k]
                    sk = c["swap_k"][k]
                    pv = [per_v_planes[v][:, :, k] * av for v in range(3)]
                    # un-swap: contribution to canonical v1/v2
                    p1 = sk * pv[2] + (1.0 - sk) * pv[1]
                    p2 = sk * pv[1] + (1.0 - sk) * pv[2]
                    canon = (pv[0], p1, p2)
                    for v in range(3):
                        tgt = _VMAP[k][v]
                        acc[tgt] = acc[tgt] + canon[v]

                def pad(a, jlo, ilo):
                    return jax.lax.pad(
                        a, jnp.asarray(0.0, a.dtype),
                        [(jlo, 1 - jlo, 0), (ilo, 1 - ilo, 0)],
                    )

                page = (
                    pad(acc["bl"], 0, 0) + pad(acc["br"], 0, 1)
                    + pad(acc["tl"], 1, 0) + pad(acc["tr"], 1, 1)
                )
                cols.append(
                    jnp.concatenate(
                        [page.reshape(stride), acc["M"].reshape(nx * ny)]
                    )
                )
            return jnp.stack(cols, axis=1)  # [NP, 2]

        def x_update(x_bar, z_t, u_t, c):
            rhs = tau * x_bar + dt2w2 * scatter_t(z_t - u_t, c)
            return rhs / c["t_diag"][:, None]

        def cells_t(z_t, c):
            """Per-slot 16-wide cell rows -> [48, T, 8, 128] (the only
            index op left: 3 gathers of NFd rows from the cell table —
            data-dependent on the CURRENT z positions, same semantics and
            bit-identical rows as the AoS wrapper's fetch)."""
            ax, ay = c["axes"]
            ncx = ax.shape[0] - 1
            z = z_t.reshape(6, NFd)
            rows_v = []
            for v in range(3):
                xi = _cell_index(z[v * 2 + 0], ax)
                yi = _cell_index(z[v * 2 + 1], ay)
                rows = c["cell_table"][yi * ncx + xi]  # [NFd, 16]
                rows_v.append(rows.T)                  # [16, NFd]
            return jnp.concatenate(rows_v).reshape(48, T, 8, 128)

        def prox_t(z_t, dxpu_t, c):
            zo, ih0 = tiled_call(
                z_t, dxpu_t, c["free_t"], cells_t(z_t, c),
                prox_tol, prox_iters,
            )
            return zo, ih0  # ih0 [T, 8, 128]

        def grad_at(x, c):
            """Predictor euler gradient on the COMPACT mesh path (runs
            rarely; the stock batched ops fit at 2D sizes)."""
            from ..ops.monitor_grid import gather_cell
            from ..ops.scatter import gather_elements, scatter_add_dense

            z = gather_elements(x, c["F"])
            cells = jax.vmap(
                jax.vmap(gather_cell, in_axes=(None, 0)),
                in_axes=(None, 0),
            )(c["grid"], z)
            ih_e, g_e = jax.vmap(
                lambda zz, xx, cc: huang.element_energy_grad(
                    zz, xx, None, mesh.ehat, False, cells=cc
                )
            )(z, c["xi"], cells)
            return scatter_add_dense(g_e * c["elem_free"], c["dense_idx"])

        def step(state: Grid2DState, c: dict):
            x, x_prev, u, steps, ih_last, rose, rises = state

            def euler(_):
                return x - (dt / tau) * grad_at(x, c)

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
                lambda _: gather_t(x_prev2, c),
                lambda _: gather_t(x, c),
                None,
            )
            u = jnp.where(steps == 0, jnp.zeros_like(u), u)
            x = x_update(x_bar, z, u, c)

            valid = c["valid_t"]

            def msum(a_t):
                return block_sumsq_f64(a_t * valid[None])

            def cond_fn(carry):
                i, done, *_ = carry
                return jnp.logical_and(i < n_iters, ~done)

            def body_fn(carry):
                i, _, x, gx, z, u, ih_start, primal, dual = carry
                dxpu = gx + u
                z_prev = z
                z, ih0 = prox_t(z, dxpu, c)
                ih_cur = block_sum_f64(jnp.where(valid > 0, ih0, 0.0))
                ih_start = jnp.where(i == 0, ih_cur, ih_start)
                u = dxpu - z
                x = x_update(x_bar, z, u, c)
                gx = gather_t(x, c)
                primal = jnp.sqrt(msum(gx - z))
                dual = jnp.sqrt(msum(z - z_prev))
                done = jnp.logical_and(primal < tol, dual < tol)
                return (i + 1, done, x, gx, z, u, ih_start, primal, dual)

            init = (
                jnp.zeros((), jnp.int32), jnp.zeros((), bool),
                x, gather_t(x, c), z, u,
                jnp.zeros((), jnp.float64), jnp.zeros((), jnp.float64),
                jnp.zeros((), jnp.float64),
            )
            (i, _, x, _, z, u, ih_start, primal,
             dual) = jax.lax.while_loop(cond_fn, body_fn, init)

            rose_next = ih_start > ih_last
            rises_next = jnp.where(ih_start > ih_last, rises + 1, 0)
            new_state = Grid2DState(
                x=x, x_prev=x_prev2, u=u, steps=steps + 1,
                ih_last=ih_start, rose=rose_next, rises=rises_next,
            )
            return new_state, StepInfo(
                ih_start=ih_start, primal=primal, dual=dual, n_iters=i
            )

        return step

    # ------------------------------------------------------------------
    def step(self, state: Grid2DState):
        return self._step_jit(state, self._consts)

    def multi_step(self, state: Grid2DState, k: int):
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

    def energy(self, state: Grid2DState) -> float:
        return float(self.mesh.energy(state.x))
