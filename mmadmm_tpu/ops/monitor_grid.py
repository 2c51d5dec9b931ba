"""Monitor-function background grid: build (host) + sampling (device).

Replaces the reference's ``MeshInterpolator`` (``src/MeshInterpolator.cpp``):

1. a uniform background grid with ``n = int((NP*D)^(1/D))`` cells per axis
   over the vertex bounding box (``MeshInterpolator.cpp:68-130`` — note the
   reference uses ``X->size()`` = NP*D, not NP),
2. the monitor evaluated at mesh vertices and scattered to grid nodes by
   1-nearest-neighbor (nanoflann KD-tree in the reference,
   ``MeshInterpolator.cpp:166-241``; a scipy cKDTree / grid-hash here —
   setup-time, host),
3. weighted-Jacobi smoothing of interior grid nodes, 5 sweeps in 2D
   (0.6 center + 0.1 x 4 neighbors) / 2 sweeps in 3D (0.6 + 0.4/6 x 6)
   (``MeshInterpolator.cpp:366-404``),
4. bi/trilinear sampling on device (``evalMonitorOnGrid``,
   ``MeshInterpolator.cpp:287-342``) — the hot-path op, a gather + fma
   inside the prox kernel.

The grid is built once at mesh construction and never refreshed, exactly like
the reference (``Mesh.cpp:431-433``; the refresh in ``Mesh::setUp`` is
commented out, ``Mesh.cpp:1007-1014``).

Reference 3D indexing quirk preserved behind ``compat_3d_transpose`` (default
True): the 3D NN scatter writes ``[k, i, j]`` while the sampler reads
``[k, j, i]`` (``MeshInterpolator.cpp:198`` vs ``:329-336``), effectively
sampling the monitor with x/y swapped. Shipped 3D baselines used monitors
that are x/y-symmetric or affected by this, so we replicate it.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclass
class MonitorGrid:
    """Background grid of flattened monitor tensors.

    values: [(nz+1)?, ny+1, nx+1, D*D] (2D: [ny+1, nx+1, 4])
    axes:   tuple of per-axis node coordinate arrays (x, y[, z])
    cell_table:
      2D — [ny*nx, 4*DD + 4] rows of
      (v00, v10, v01, v11, x0, x1, y0, y1) per cell, so freezing a cell is
      ONE wide-row gather instead of 4 narrow ones.
      3D (symmetric monitor, every shipped one is SPD) — [ncells, 48]:
      the 8 corner tensors compressed to 6 unique entries each, ONE
      48-f32 row gather per vertex; cell bounds are gathered from the
      tiny 1-D axis arrays. Probed on the chip at 3.07M indices
      (scripts/tpu_celltable3d_probe.py): 1x wide 54-64 f32 row = 35 ms
      vs 8x narrow 9-f32 = 164 ms vs 3x 16-f32 strips = 158 ms — the 2D
      "cliff above 16 f32" does NOT generalize; per-gather index
      processing dominates, so fewer-wider wins. None when the table
      would exceed ~1 GB (very fine 3D grids) — the narrow path remains.
    """

    values: jnp.ndarray
    axes: tuple
    cell_table: jnp.ndarray | None = None
    # STATIC (trace-time) flag: every grid node holds the same D*D tensor
    # (a constant monitor, e.g. MEx0 identity — the entire 3DMonitor1
    # baseline family). gather_cell then broadcasts one row instead of
    # gathering 2^D corner tensors per vertex; bounds still come from the
    # (tiny) axis arrays, so sampled values stay BIT-IDENTICAL to the
    # general path. Detected in build_monitor_grid.
    constant: bool = False

    def tree_flatten(self):
        return (self.values, self.axes, self.cell_table), self.constant

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(
            values=children[0], axes=children[1], cell_table=children[2],
            constant=aux,
        )

    @property
    def dim(self):
        return len(self.axes)


def _linspace_ref(lo: float, hi: float, ns: int) -> np.ndarray:
    """utils::linspace (MeshUtils.h:24-29): lo + i*(hi-lo)/ns, i=0..ns."""
    i = np.arange(ns + 1, dtype=np.float64)
    return lo + i * (hi - lo) / ns


def build_monitor_grid(
    X: np.ndarray,
    monitor,
    num_smooth: int | None = None,
    compat_3d_transpose: bool = True,
    dtype=jnp.float64,
) -> MonitorGrid:
    """Host-side grid construction (setup time; native C++ grid-hash NN with
    a SciPy cKDTree fallback — see ``runtime.native``)."""
    from ..runtime.native import grid_nn_map

    NP, D = X.shape
    n = int((NP * D) ** (1.0 / D))  # MeshInterpolator.cpp:78-85 uses X.size()
    if num_smooth is None:
        num_smooth = 5 if D == 2 else 2  # MeshInterpolator.cpp:247-252

    mon_vals = monitor(X).reshape(NP, D * D)  # row-major flatten, like
    # MonitorFunction::evaluateAtVertices (MonitorFunction.cpp:16-32)

    lo = X.min(axis=0)
    hi = X.max(axis=0)
    axes = tuple(_linspace_ref(lo[d], hi[d], n) for d in range(D))

    nn = grid_nn_map(X, lo, hi, n)
    if D == 2:
        grid = mon_vals[nn].reshape(n + 1, n + 1, D * D)  # [j, i, :]
    else:
        grid = mon_vals[nn].reshape(n + 1, n + 1, n + 1, D * D)  # [k, j, i, :]
        if compat_3d_transpose:
            # reference writes [k, i, j] and reads [k, j, i]
            # (MeshInterpolator.cpp:198, :329-336)
            grid = np.swapaxes(grid, 1, 2)

    grid = _smooth_grid(grid, num_smooth)
    # constant-monitor detection: NN scatter assigns every grid node some
    # vertex's tensor and Jacobi smoothing is an affine average, so a
    # constant monitor yields a bitwise-constant grid
    is_constant = bool(np.all(grid.reshape(-1, D * D) == grid.reshape(-1, D * D)[0]))
    cell_table = None
    if is_constant and D == 3:
        # 3D only: corner values are one broadcast row (replaces 8 narrow
        # 9-f32 gathers/vertex — the big 3D win); the remaining per-vertex
        # cost is the CELL BOUNDS. 2*D separate scalar gathers from the
        # axis arrays measurably lose to ONE narrow row gather (per-gather
        # index processing dominates — scripts/tpu_celltable3d_probe.py),
        # so pack the bounds into a [ncells, 2D] table, bit-identical to
        # the axis values. Size-gated like the full table; the fallback is
        # the scalar-axis path in gather_cell. In 2D the general 16-wide
        # table already fetches corners+bounds in ONE gather, and the
        # on-chip A/B (scripts/tpu_constgrid_ab.py, Monitor1320: 144.6 vs
        # 150.6 ms/step, bit-identical trajectory) shows broadcast+bounds
        # LOSES to it — so constant 2D grids keep the normal table below.
        ncells = (grid.shape[0] - 1) ** D
        bounds_tbl = None
        if ncells * 2 * D * np.dtype("float32").itemsize < 2**30:
            ax, ay, az = axes
            n = len(ax) - 1
            shp = (n, n, n)  # [zi, yi, xi]
            parts = [
                np.broadcast_to(ax[None, None, :-1], shp),
                np.broadcast_to(ax[None, None, 1:], shp),
                np.broadcast_to(ay[None, :-1, None], shp),
                np.broadcast_to(ay[None, 1:, None], shp),
                np.broadcast_to(az[:-1, None, None], shp),
                np.broadcast_to(az[1:, None, None], shp),
            ]
            bounds_tbl = jnp.asarray(
                np.stack(parts, axis=-1).reshape(ncells, 2 * D), dtype=dtype
            )
        return MonitorGrid(
            values=jnp.asarray(grid, dtype=dtype),
            axes=tuple(jnp.asarray(a, dtype=dtype) for a in axes),
            cell_table=bounds_tbl,
            constant=True,
        )
    if D == 2:
        ax, ay = axes
        v00 = grid[:-1, :-1]  # [ny, nx, DD]
        v10 = grid[:-1, 1:]
        v01 = grid[1:, :-1]
        v11 = grid[1:, 1:]
        ny, nx = v00.shape[:2]
        x0 = np.broadcast_to(ax[None, :-1], (ny, nx))[..., None]
        x1 = np.broadcast_to(ax[None, 1:], (ny, nx))[..., None]
        y0 = np.broadcast_to(ay[:-1, None], (ny, nx))[..., None]
        y1 = np.broadcast_to(ay[1:, None], (ny, nx))[..., None]
        if np.array_equal(grid[..., 1], grid[..., 2]):
            # symmetric monitor (every shipped monitor is SPD; NN scatter
            # and Jacobi smoothing preserve m01 == m10 bitwise): store
            # (m00, m01, m11) per corner -> 16-f32 rows. TPU row gathers
            # have a cost cliff above 16 f32/row (measured 9.8 ms for
            # 20-wide vs 6.6 ms for 16-wide at 921,600 indices);
            # gather_cell reconstructs the full 2x2 tensor bit-exactly.
            sym = [0, 1, 3]
            parts = [v00[..., sym], v10[..., sym], v01[..., sym],
                     v11[..., sym], x0, x1, y0, y1]
            width = 4 * 3 + 4
        else:  # non-symmetric fallback: full 4-entry corners, 20-wide
            parts = [v00, v10, v01, v11, x0, x1, y0, y1]
            width = 4 * D * D + 4
        cell_table = jnp.asarray(
            np.concatenate(parts, axis=-1).reshape(ny * nx, width),
            dtype=dtype,
        )
    else:  # D == 3
        symmetric = (
            np.array_equal(grid[..., 1], grid[..., 3])
            and np.array_equal(grid[..., 2], grid[..., 6])
            and np.array_equal(grid[..., 5], grid[..., 7])
        )
        ncells = (grid.shape[0] - 1) ** 3
        if symmetric and ncells * 48 * np.dtype("float32").itemsize < 2**30:
            # 6 unique entries x 8 corners = 48 f32/cell, ONE row gather
            # per vertex (probed fastest — see class docstring). Corner
            # order matches the narrow path's vals stack; gather_cell
            # rebuilds the full 3x3 bit-exactly from
            # (m00, m01, m02, m11, m12, m22).
            g = grid
            corners = [
                g[:-1, :-1, :-1], g[:-1, :-1, 1:],
                g[:-1, 1:, :-1], g[:-1, 1:, 1:],
                g[1:, :-1, :-1], g[1:, :-1, 1:],
                g[1:, 1:, :-1], g[1:, 1:, 1:],
            ]
            sym_idx = [0, 1, 2, 4, 5, 8]
            cell_table = jnp.asarray(
                np.concatenate(
                    [c[..., sym_idx] for c in corners], axis=-1
                ).reshape(ncells, 48),
                dtype=dtype,
            )
    return MonitorGrid(
        values=jnp.asarray(grid, dtype=dtype),
        axes=tuple(jnp.asarray(a, dtype=dtype) for a in axes),
        cell_table=cell_table,
    )


def _smooth_grid(grid: np.ndarray, n_iters: int) -> np.ndarray:
    """Weighted-Jacobi smoothing of interior nodes
    (MeshInterpolator.cpp:366-404)."""
    g = grid.copy()
    if grid.ndim == 3:  # 2D: [ny+1, nx+1, DD]
        for _ in range(n_iters):
            t = g.copy()
            g[1:-1, 1:-1] = (
                0.6 * t[1:-1, 1:-1]
                + 0.1 * (t[1:-1, 2:] + t[1:-1, :-2] + t[2:, 1:-1] + t[:-2, 1:-1])
            )
    else:  # 3D: [nz+1, ny+1, nx+1, DD]
        h = 0.4 / 6.0
        for _ in range(n_iters):
            t = g.copy()
            g[1:-1, 1:-1, 1:-1] = 0.6 * t[1:-1, 1:-1, 1:-1] + h * (
                t[1:-1, 1:-1, 2:]
                + t[1:-1, 1:-1, :-2]
                + t[1:-1, 2:, 1:-1]
                + t[1:-1, :-2, 1:-1]
                + t[2:, 1:-1, 1:-1]
                + t[:-2, 1:-1, 1:-1]
            )
    return g


def _cell_index(w, axis):
    """utils::findLimInfMeshPoint (MeshUtils.h:45-54), including the
    uint32-wraparound clamp: values below the grid by a whole cell or more
    clamp to the *last* cell."""
    n_cells = axis.shape[0] - 1
    t = (w - axis[0]) / (axis[1] - axis[0])
    it = jnp.trunc(t).astype(jnp.int32)  # C (int) cast truncates toward 0
    last = jnp.int32(n_cells - 1)  # typed: weak-i64 scalars break Mosaic
    return jnp.where(it < 0, last, jnp.minimum(it, last))


def sample_monitor(grid: MonitorGrid, pnt: jnp.ndarray) -> jnp.ndarray:
    """Bi/trilinear sample of the D x D monitor at one point
    (``evalMonitorOnGrid``, MeshInterpolator.cpp:287-342). vmap over points.
    """
    D = grid.dim
    if D == 2:
        ax, ay = grid.axes
        xi = _cell_index(pnt[0], ax)
        yi = _cell_index(pnt[1], ay)
        x0, x1 = ax[xi], ax[xi + 1]
        y0, y1 = ay[yi], ay[yi + 1]
        norm = 1.0 / ((x1 - x0) * (y1 - y0))
        x, y = pnt[0], pnt[1]
        c00 = norm * (x1 - x) * (y1 - y)
        c10 = norm * (x - x0) * (y1 - y)
        c01 = norm * (x1 - x) * (y - y0)
        c11 = norm * (x - x0) * (y - y0)
        v = (
            c00 * grid.values[yi, xi]
            + c10 * grid.values[yi, xi + 1]
            + c01 * grid.values[yi + 1, xi]
            + c11 * grid.values[yi + 1, xi + 1]
        )
        return v.reshape(2, 2)
    else:
        ax, ay, az = grid.axes
        xi = _cell_index(pnt[0], ax)
        yi = _cell_index(pnt[1], ay)
        zi = _cell_index(pnt[2], az)
        xd = (pnt[0] - ax[xi]) / (ax[xi + 1] - ax[xi])
        yd = (pnt[1] - ay[yi]) / (ay[yi + 1] - ay[yi])
        zd = (pnt[2] - az[zi]) / (az[zi + 1] - az[zi])
        g = grid.values
        v = (
            (1 - xd) * (1 - yd) * (1 - zd) * g[zi, yi, xi]
            + xd * (1 - yd) * (1 - zd) * g[zi, yi, xi + 1]
            + (1 - xd) * yd * (1 - zd) * g[zi, yi + 1, xi]
            + xd * yd * (1 - zd) * g[zi, yi + 1, xi + 1]
            + (1 - xd) * (1 - yd) * zd * g[zi + 1, yi, xi]
            + xd * (1 - yd) * zd * g[zi + 1, yi, xi + 1]
            + (1 - xd) * yd * zd * g[zi + 1, yi + 1, xi]
            + xd * yd * zd * g[zi + 1, yi + 1, xi + 1]
        )
        return v.reshape(3, 3)


sample_monitor_batch = jax.vmap(sample_monitor, in_axes=(None, 0))


# --- frozen-cell sampling -----------------------------------------------
#
# TPU-native hot-loop redesign: dynamic table gathers are the slowest op in
# the prox Newton iteration, and within one prox call vertices move far
# less than a grid cell. ``gather_cell`` fetches the (2^D) corner tensors +
# cell bounds ONCE per prox call; ``sample_frozen`` then evaluates the
# bi/trilinear form as pure arithmetic (exact while the vertex stays in its
# cell, continuous linear extrapolation if it crosses — the cells refresh
# at the next ADMM iteration). The reference re-gathers per BFGS iteration
# — cheap on CPU, pathological on TPU.


def gather_cell(grid: MonitorGrid, pnt: jnp.ndarray) -> dict:
    """Fetch the interpolation cell for one point: corner values
    [2^D, D*D] + bounds. vmap over points."""
    D = grid.dim
    if grid.constant:
        # constant grid (static flag): all corner tensors equal grid node 0
        # — broadcast it instead of 2^D big-tensor gathers. Bounds come
        # from ONE narrow [ncells, 2D] row gather (bit-identical to the
        # axis values; 2*D scalar axis gathers lose to a single row
        # gather), with the scalar-axis fallback when the bounds table
        # was size-gated away.
        flat0 = grid.values.reshape(-1, D * D)[0]
        vals = jnp.broadcast_to(flat0, (2**D, D * D))
        if D == 2:
            ax, ay = grid.axes
            xi = _cell_index(pnt[0], ax)
            yi = _cell_index(pnt[1], ay)
            if grid.cell_table is not None:
                nx = ax.shape[0] - 1
                row = grid.cell_table[yi * nx + xi]
                return dict(
                    vals=vals, x0=row[0], x1=row[1], y0=row[2], y1=row[3]
                )
            return dict(
                vals=vals, x0=ax[xi], x1=ax[xi + 1], y0=ay[yi], y1=ay[yi + 1]
            )
        ax, ay, az = grid.axes
        xi = _cell_index(pnt[0], ax)
        yi = _cell_index(pnt[1], ay)
        zi = _cell_index(pnt[2], az)
        if grid.cell_table is not None:
            n = ax.shape[0] - 1
            row = grid.cell_table[(zi * n + yi) * n + xi]
            return dict(
                vals=vals,
                x0=row[0], x1=row[1], y0=row[2], y1=row[3],
                z0=row[4], z1=row[5],
            )
        return dict(
            vals=vals,
            x0=ax[xi], x1=ax[xi + 1],
            y0=ay[yi], y1=ay[yi + 1],
            z0=az[zi], z1=az[zi + 1],
        )
    if D == 2:
        ax, ay = grid.axes
        xi = _cell_index(pnt[0], ax)
        yi = _cell_index(pnt[1], ay)
        if grid.cell_table is not None:
            nx = ax.shape[0] - 1
            row = grid.cell_table[yi * nx + xi]  # one wide gather row
            dd = D * D
            if grid.cell_table.shape[-1] == 4 * 3 + 4:  # symmetric layout
                v = row[:12].reshape(4, 3)  # (m00, m01, m11) per corner
                vals = jnp.stack(
                    [v[:, 0], v[:, 1], v[:, 1], v[:, 2]], axis=1
                )  # row-major (m00, m01, m10, m11), m10 := m01 bit-equal
                return dict(
                    vals=vals,
                    x0=row[12], x1=row[13], y0=row[14], y1=row[15],
                )
            return dict(
                vals=row[: 4 * dd].reshape(4, dd),
                x0=row[4 * dd], x1=row[4 * dd + 1],
                y0=row[4 * dd + 2], y1=row[4 * dd + 3],
            )
        g = grid.values
        vals = jnp.stack(
            [g[yi, xi], g[yi, xi + 1], g[yi + 1, xi], g[yi + 1, xi + 1]]
        )  # [4, DD]
        return dict(
            vals=vals, x0=ax[xi], x1=ax[xi + 1], y0=ay[yi], y1=ay[yi + 1]
        )
    ax, ay, az = grid.axes
    xi = _cell_index(pnt[0], ax)
    yi = _cell_index(pnt[1], ay)
    zi = _cell_index(pnt[2], az)
    if grid.cell_table is not None:
        # symmetric table: ONE wide-row gather (48 f32) replaces the 8
        # narrow corner gathers below; same grid entries, so the
        # reconstructed tensors are bit-identical
        n = ax.shape[0] - 1
        ci = (zi * n + yi) * n + xi
        row = grid.cell_table[ci]  # [48]
        v6 = row.reshape(8, 6)  # (m00, m01, m02, m11, m12, m22) per corner
        full = jnp.array([0, 1, 2, 1, 3, 4, 2, 4, 5], dtype=jnp.int32)
        vals = v6[:, full]  # [8, 9] row-major, m10:=m01 etc bit-equal
    else:
        g = grid.values
        vals = jnp.stack(
            [
                g[zi, yi, xi], g[zi, yi, xi + 1],
                g[zi, yi + 1, xi], g[zi, yi + 1, xi + 1],
                g[zi + 1, yi, xi], g[zi + 1, yi, xi + 1],
                g[zi + 1, yi + 1, xi], g[zi + 1, yi + 1, xi + 1],
            ]
        )  # [8, DD]
    return dict(
        vals=vals,
        x0=ax[xi], x1=ax[xi + 1],
        y0=ay[yi], y1=ay[yi + 1],
        z0=az[zi], z1=az[zi + 1],
    )


def sample_frozen(cell: dict, pnt: jnp.ndarray) -> jnp.ndarray:
    """Bi/trilinear sample from a frozen cell (no gathers; same formula as
    ``sample_monitor``)."""
    vals = cell["vals"]
    D = 2 if vals.shape[0] == 4 else 3
    if D == 2:
        x0, x1, y0, y1 = cell["x0"], cell["x1"], cell["y0"], cell["y1"]
        norm = 1.0 / ((x1 - x0) * (y1 - y0))
        x, y = pnt[0], pnt[1]
        c00 = norm * (x1 - x) * (y1 - y)
        c10 = norm * (x - x0) * (y1 - y)
        c01 = norm * (x1 - x) * (y - y0)
        c11 = norm * (x - x0) * (y - y0)
        v = c00 * vals[0] + c10 * vals[1] + c01 * vals[2] + c11 * vals[3]
        return v.reshape(2, 2)
    x0, x1 = cell["x0"], cell["x1"]
    y0, y1 = cell["y0"], cell["y1"]
    z0, z1 = cell["z0"], cell["z1"]
    xd = (pnt[0] - x0) / (x1 - x0)
    yd = (pnt[1] - y0) / (y1 - y0)
    zd = (pnt[2] - z0) / (z1 - z0)
    v = (
        (1 - xd) * (1 - yd) * (1 - zd) * vals[0]
        + xd * (1 - yd) * (1 - zd) * vals[1]
        + (1 - xd) * yd * (1 - zd) * vals[2]
        + xd * yd * (1 - zd) * vals[3]
        + (1 - xd) * (1 - yd) * zd * vals[4]
        + xd * (1 - yd) * zd * vals[5]
        + (1 - xd) * yd * zd * vals[6]
        + xd * yd * zd * vals[7]
    )
    return v.reshape(3, 3)
