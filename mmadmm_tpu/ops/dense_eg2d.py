"""Shared dense-grid (ih, grad) evaluator for structured 2D meshes.

The ``Mesh::eulerStepMod`` gradient (unmasked per-element grads,
scatter to all nodes, INTERIOR mask; ``Mesh.cpp:533-579``) evaluated on
the round-5 stencil engine with the VMEM Pallas component kernels:
window-slice gather -> ``make_be_kernels2d`` eg kernel -> shifted
pad-add scatter. Used by the explicit-Euler integrator at scale; the
backward-Euler integrator embeds the same construction (plus the
Hessian kernel) in its step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .monitor_grid import _cell_index
from .reductions import block_sum_f64
from .stencil2d import make_stencil_ops, match_dense


def make_dense_eg2d(mesh, nx: int, ny: int):
    """Returns ``(consts, eg)`` with ``eg(x [NP,2], grid, consts,
    interior_nodes) -> (ih_f64, g [NP,2])``, or ``None`` if the mesh is
    not the uncompacted rect layout / not kernel-eligible."""
    stride = (nx + 1) * (ny + 1)
    NFd = 4 * nx * ny
    grid = mesh.grid
    if (
        mesh.n_pnts != stride + nx * ny
        or NFd % 1024 != 0
        or grid.cell_table is None
        or grid.constant
        or grid.cell_table.shape[-1] != 16
    ):
        return None
    try:
        alive, swapped, _ = match_dense(nx, ny, mesh._F_np)
    except AssertionError:
        return None
    Td = NFd // 1024

    def planes(v):
        return v.reshape(ny, nx, 4).transpose(2, 0, 1)

    consts = dict(
        swap_k=jnp.asarray(
            planes(swapped.astype(np.float64)), dtype=mesh.dtype
        ),
        alive_k=jnp.asarray(
            planes(alive.astype(np.float64)), dtype=mesh.dtype
        ),
        valid_d=jnp.asarray(
            alive.astype(np.float64), dtype=mesh.dtype
        ),
    )

    from .prox_pallas2d import make_be_kernels2d

    interp = jax.default_backend() not in ("tpu", "axon")
    eg_k, _ = make_be_kernels2d(mesh.ehat, interpret=interp)
    gather_ch, scatter_ch = make_stencil_ops(nx, ny)

    def eg(x, grid_arg, c, interior_nodes):
        z_ch = gather_ch(x, c["swap_k"])               # [6, NFd]
        ax, ay = grid_arg.axes
        ncx = ax.shape[0] - 1
        rows = []
        for v in range(3):
            xi = _cell_index(z_ch[v * 2], ax)
            yi = _cell_index(z_ch[v * 2 + 1], ay)
            rows.append(grid_arg.cell_table[yi * ncx + xi].T)
        cells_t = jnp.concatenate(rows).reshape(48, Td, 8, 128)
        g_t, ih_t = eg_k(z_ch.reshape(6, Td, 8, 128), cells_t)
        g = scatter_ch(
            g_t.reshape(6, NFd), c["swap_k"], c["alive_k"]
        ) * interior_nodes
        ih = block_sum_f64(
            jnp.where(c["valid_d"] > 0, ih_t.reshape(NFd), 0.0)
        )
        return ih, g

    return consts, eg
