"""MovingMesh: device-resident mesh state + precomputed operators.

The TPU-native analogue of the reference's ``Mesh<D>`` (``src/Mesh.h:16-126``)
with objects replaced by dense arrays:

* ``X [NP, D]`` node positions, ``F [NF, D+1]`` int32 connectivity,
  ``mask [NP]`` NodeType,
* the sparse operators the reference builds (``M = tau I``,
  ``Dmat``, ``W = w I``; ``Mesh.cpp:677-753``) reduce to: a scalar ``tau``,
  a gather/segment-sum pair, a scalar ``w``, and the node-degree vector
  (diag of ``D^T D``),
* the monitor interpolation grid, built once at construction
  (``Mesh.cpp:431-433``),
* the batched prox solver (``ops.prox``) replacing per-element BFGS.

Reference quirk preserved: the JSON ``w`` is overridden by
``w = 0.5 sqrt(rho)`` (``Mesh.cpp:451``).
"""

from __future__ import annotations

import math
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .geometry.node_type import NodeType
from .geometry import topology
from .ops import huang
from .ops.reductions import block_sum_f64
from .ops.monitor_grid import build_monitor_grid
from .ops.prox import make_prox_solver
from .ops.scatter import gather_elements, scatter_add_dense


class MovingMesh:
    def __init__(
        self,
        X: np.ndarray,
        F: np.ndarray,
        mask: np.ndarray,
        monitor,
        *,
        rho: float,
        tau: float,
        comp_mesh: bool = False,
        Xc: np.ndarray | None = None,
        dtype=jnp.float64,
        num_smooth: int | None = None,
        prox_backend: str = "auto",
    ):
        X = np.asarray(X, dtype=np.float64)
        F = np.asarray(F, dtype=np.int32)
        mask = np.asarray(mask, dtype=np.int8)
        self.dim = X.shape[1]
        self.dtype = dtype
        self.n_pnts = X.shape[0]

        # positive orientation (Mesh.cpp:408 -> 244-260)
        F = topology.reorient_elements(X, F)
        self.n_elements = F.shape[0]

        self.tau = float(tau)
        self.rho = float(rho)
        self.w = 0.5 * math.sqrt(rho)  # Mesh.cpp:451 (overrides JSON w)
        self.comp_mesh = bool(comp_mesh)

        # topology / scatter plan
        deg = topology.node_degrees(F, self.n_pnts)
        dense_idx, _ = topology.dense_scatter_plan(F, self.n_pnts)
        self.boundary_faces = topology.build_boundary_faces(F, mask)

        # monitor grid (built once; never refreshed — Mesh.cpp:1007-1014)
        self.monitor = monitor
        self.grid = build_monitor_grid(X, monitor, num_smooth=num_smooth, dtype=dtype)

        # device arrays
        self.X0 = jnp.asarray(X, dtype=dtype)
        self.F = jnp.asarray(F)
        self.mask_np = mask
        self.deg = jnp.asarray(deg, dtype=dtype)
        self.dense_idx = jnp.asarray(dense_idx)

        fixed_v = mask[F] == NodeType.BOUNDARY_FIXED  # [NF, D+1]
        self._X_np = X
        self._F_np = F
        self._elem_free_np = np.repeat(
            ~fixed_v[:, :, None], self.dim, axis=2
        ).astype(np.float64)
        self.elem_free = jnp.asarray(
            self._elem_free_np, dtype=dtype
        )  # [NF, D+1, D] 1.0 where movable
        self.interior_nodes = jnp.asarray(
            (mask == NodeType.INTERIOR).astype(np.float64)[:, None], dtype=dtype
        )  # [NP, 1]

        self.ehat = huang.reference_ehat(self.dim, self.n_elements).astype(dtype)
        if self.comp_mesh:
            assert Xc is not None, "comp_mesh requires Xc"
            self._xi_np = np.asarray(Xc, dtype=np.float64)[F]
        else:
            # dummy (branch is static; never read)
            self._xi_np = np.zeros(
                (self.n_elements, self.dim + 1, self.dim), dtype=np.float64
            )
        self.xi = jnp.asarray(self._xi_np, dtype=dtype)

        # prox with the monitor grid threaded as a CALL-TIME argument —
        # closed-over multi-MB arrays become HLO constants and blow up the
        # (remote) TPU compile; integrators pass the grid explicitly.
        # Backend decision (round 3, measured on the chip): the vmapped
        # XLA solver IS the TPU backend — 46.4 ms/call at Monitor1320
        # (307k elements). A fused Pallas SoA kernel (VMEM-resident
        # Newton loop) was prototyped through round 2 but NEVER compiled
        # on real hardware: Mosaic rejects the leading-dim shape casts
        # the matrix-form element math requires ("infer-vector-layout:
        # unsupported shape cast", vector<128x8x6> -> <128x8x3x2>), so it
        # was removed (git history: ops/prox_pallas.py). The roofline
        # (COVERAGE.md) shows the prox is VPU-bound, not HBM-bound, so a
        # VMEM-resident kernel would need the element energy/grad/Hessian
        # rewritten in explicit per-component form to beat XLA's fusion —
        # future work, not cargo.
        if prox_backend == "auto":
            prox_backend = os.environ.get("MMADMM_PROX", "vmap")
        if prox_backend == "pallas":
            # round-4 component-form kernel (ops/prox_pallas2d.py): one
            # (8,128) vreg per tensor entry, no shape casts — the fix the
            # round-3 post-mortem identified after Mosaic rejected the
            # matrix-form kernel's leading-dim casts. Scope: the headline
            # 2D family (no comp mesh, symmetric 16-wide cell table).
            ok2d = (
                self.dim == 2 and not self.comp_mesh
                and self.grid.cell_table is not None
                and not self.grid.constant
                and self.grid.cell_table.shape[-1] == 16
            )
            # 3D supports CompMesh too: the xi-mesh Ehat rides in as 9
            # extra per-element tiles (prox_pallas3d comp_mesh=True)
            ok3d = (
                self.dim == 3
                and (
                    self.grid.constant
                    or (self.grid.cell_table is not None
                        and self.grid.cell_table.shape[-1] == 48)
                )
            )
            if not (ok2d or ok3d):
                raise ValueError(
                    "prox_backend 'pallas' supports non-comp-mesh "
                    "symmetric/constant-monitor problems only; use 'vmap'"
                )
        elif prox_backend != "vmap":
            raise ValueError(f"unknown prox_backend {prox_backend!r}")
        # entry-Jacobian slab size: the jacfwd build is the peak-memory op
        # at production 3D sizes (12 tangent copies of the per-element
        # intermediates); stream it through bounded slabs there. 2D (6x6)
        # and small 3D keep the single full-batch vmap.
        jac_batch = os.environ.get("MMADMM_JAC_BATCH")
        if jac_batch is not None:
            jac_batch = int(jac_batch) or None
        elif self.dim == 3 and self.n_elements > 300_000:
            jac_batch = 131_072
        if prox_backend == "pallas":
            interp = jax.default_backend() not in ("tpu", "axon")
            if self.dim == 2:
                from .ops.prox_pallas2d import make_prox_pallas2d

                self.prox_fn = make_prox_pallas2d(
                    self.ehat, self.w, interpret=interp
                )
            else:
                from .ops.prox_pallas3d import make_prox_pallas3d

                # CHORD sweeps for comp-mesh problems: the 3DMonitor3
                # family is weakly regularized (rho=10) and its elements
                # stay active for many sweeps — the exact-Newton kernel
                # paid a full 12x12 Hessian per sweep and LOST to the
                # vmap chord there (round 4); the chord kernel caches the
                # Hessian in VMEM and refreshes only rejecting tiles.
                # MMADMM_PROX_CHORD=1/0 forces it on/off for A/B.
                env_ch = os.environ.get("MMADMM_PROX_CHORD")
                chord = (
                    env_ch == "1"
                    or (env_ch != "0" and self.comp_mesh)
                )
                self.prox_fn = make_prox_pallas3d(
                    self.ehat, self.w, comp_mesh=self.comp_mesh,
                    chord=chord, interpret=interp,
                )
        else:
            self.prox_fn = make_prox_solver(
                self.ehat, self.comp_mesh, self.w, self.dim,
                jac_batch=jac_batch,
            )
        self.prox_backend = prox_backend

        # batched element functions; grid passed as an argument, not closed
        # over, for the same compile-size reason. Monitor sampling goes
        # through gather_cell + sample_frozen — ONE wide-row cell-table
        # gather per vertex instead of sample_monitor's 2^D narrow grid
        # gathers (bit-identical values: same cell, same bilinear
        # expression; measured 102 ms -> ~12 ms for the full-batch
        # energy+grad at Monitor1320 on TPU).
        ehat, cm = self.ehat, self.comp_mesh
        from .ops.monitor_grid import gather_cell

        gather_cells = jax.vmap(
            jax.vmap(gather_cell, in_axes=(None, 0)), in_axes=(None, 0)
        )
        _energy_cells = jax.vmap(
            lambda z, xi, cells: huang.element_energy(
                z, xi, None, ehat, cm, cells=cells
            )
        )
        _energy_grad_cells = jax.vmap(
            lambda z, xi, cells: huang.element_energy_grad(
                z, xi, None, ehat, cm, cells=cells
            )
        )
        self._energy_e = lambda z, xi, grid: _energy_cells(
            z, xi, gather_cells(grid, z)
        )
        self._energy_grad_e = lambda z, xi, grid: _energy_grad_cells(
            z, xi, gather_cells(grid, z)
        )
        self._energy_jit = jax.jit(self._energy_impl)
        self._gradient_jit = jax.jit(self._gradient_impl, static_argnums=5)

    # ------------------------------------------------------------------
    def project_onto_boundary(
        self, x: jnp.ndarray, ref_x: jnp.ndarray | None = None
    ) -> jnp.ndarray:
        """Free-slip projection of BOUNDARY_FREE nodes in the proposal ``x``
        onto their incident boundary faces at the committed geometry
        ``ref_x`` (defaults to ``x``; pass the pre-step positions — the
        reference reads face vertices from ``Vp``).
        (``Mesh::projectOntoBoundary``, Mesh.cpp:119-241.) Dormant in the
        reference (all call sites commented out, Mesh.cpp:636-642, 975-984,
        1020-1026) — provided here the same way: an optional post-step
        capability, never in the hot compiled loop."""
        if not hasattr(self, "_boundary_projector"):
            from .ops.boundary import make_boundary_projector

            self._boundary_projector = jax.jit(
                make_boundary_projector(
                    self.boundary_faces, self.mask_np, self.dim
                )
            )
        return self._boundary_projector(x, x if ref_x is None else ref_x)

    def prox(self, z, xi, dxpu, free_mask, tol, max_iters):
        """Convenience wrapper binding this mesh's grid (tests/small runs;
        the integrators call ``prox_fn`` with the grid as a traced arg)."""
        return self.prox_fn(self.grid, z, xi, dxpu, free_mask, tol, max_iters)

    def gather(self, x: jnp.ndarray) -> jnp.ndarray:
        """D x (Mesh::buildDMatrix semantics)."""
        return gather_elements(x, self.F)

    def scatter_add(self, vals: jnp.ndarray) -> jnp.ndarray:
        """D^T y (degree-padded gather+sum — no TPU scatter instruction)."""
        return scatter_add_dense(vals, self.dense_idx)

    def _energy_impl(self, x, F, xi, grid) -> jnp.ndarray:
        """Mesh::computeEnergy (Mesh.cpp:497-530): sum of element energies,
        accumulated in float64."""
        e = self._energy_e(gather_elements(x, F), xi, grid)
        return block_sum_f64(e)

    def energy(self, x: jnp.ndarray) -> jnp.ndarray:
        return self._energy_jit(x, self.F, self.xi, self.grid)

    def _gradient_impl(self, x, F, xi, grid, masks, interior_only: bool):
        """(Ih, grad[NP, D]) — the assembled functional gradient.

        interior_only=False: the predictor path (``Mesh::eulerGrad``,
        Mesh.cpp:583-624) — per-element zeroing of BOUNDARY_FIXED vertex
        components (computeBlockGrad, Mesh.cpp:756-772), scatter to all
        nodes.

        interior_only=True: the Euler/backward-Euler path
        (``Mesh::eulerStepMod``, Mesh.cpp:533-579) — no per-element zeroing,
        scatter only to INTERIOR nodes.
        """
        elem_free, interior_nodes, dense_idx = masks
        z = gather_elements(x, F)
        ih_e, g_e = self._energy_grad_e(z, xi, grid)
        if interior_only:
            g = scatter_add_dense(g_e, dense_idx)
            g = g * interior_nodes
        else:
            g = scatter_add_dense(g_e * elem_free, dense_idx)
        return block_sum_f64(ih_e), g

    def gradient(self, x: jnp.ndarray, interior_only: bool):
        return self._gradient_jit(
            x, self.F, self.xi, self.grid,
            (self.elem_free, self.interior_nodes, self.dense_idx),
            interior_only,
        )

    def energy_of_z(self, z: jnp.ndarray) -> jnp.ndarray:
        """Sum of unregularized element energies at element-stacked z."""
        e = self._energy_e(z, self.xi, self.grid)
        return block_sum_f64(e)

    def build_shards(self, n_shards: int):
        """Partition-ordered, padded element shards for SPMD execution
        (see ``parallel.spmd.build_elem_shards``)."""
        from .parallel.spmd import build_elem_shards

        return build_elem_shards(
            self._X_np, self._F_np, self._xi_np, self._elem_free_np,
            self.n_pnts, n_shards, self.dtype,
        )
