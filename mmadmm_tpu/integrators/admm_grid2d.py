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
from ..ops.stencil2d import make_stencil_ops, match_dense
from .admm import StepInfo


class Grid2DState(NamedTuple):
    x: jnp.ndarray       # [NP, 2]
    x_prev: jnp.ndarray
    u: jnp.ndarray       # [6, T, 8, 128] tile-layout dual
    steps: jnp.ndarray
    ih_last: jnp.ndarray
    rose: jnp.ndarray
    rises: jnp.ndarray


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
        alive, swapped, mesh_of_dense = match_dense(nx, ny, mesh._F_np)
        NF = mesh._F_np.shape[0]
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

        gather_ch, scatter_ch = make_stencil_ops(nx, ny)

        def gather_t(x, c):
            """x [NP, 2] -> z tiles [6, T, 8, 128] via stencil slices."""
            return gather_ch(x, c["swap_k"]).reshape(6, T, 8, 128)

        def scatter_t(y_t, c):
            """Tile values [6, T, 8, 128] -> node field [NP, 2] (D^T y,
            live elements only) via shifted pad-adds."""
            return scatter_ch(
                y_t.reshape(6, NFd), c["swap_k"], c["alive_k"]
            )

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
