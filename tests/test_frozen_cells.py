"""Frozen-cell monitor sampling: exactness in-cell, continuity across."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from mmadmm_tpu.geometry.node_type import NodeType  # noqa: E402
from mmadmm_tpu.geometry.rect_mesh import generate_uniform_rect_mesh  # noqa: E402
from mmadmm_tpu.monitors import get_monitor  # noqa: E402
from mmadmm_tpu.ops.monitor_grid import (  # noqa: E402
    build_monitor_grid,
    gather_cell,
    sample_frozen,
    sample_monitor,
)


@pytest.mark.parametrize("dim", [2, 3])
def test_frozen_equals_direct_in_cell(dim):
    X, F, _ = generate_uniform_rect_mesh(
        dim, 5, 5, 5, 0, 1, 0, 1, 0, 1, NodeType.BOUNDARY_FIXED
    )
    grid = build_monitor_grid(X, get_monitor(dim, 1))
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(0.05, 0.95, size=(50, dim)))
    for p in pts[:10]:
        cell = gather_cell(grid, p)
        direct = sample_monitor(grid, p)
        frozen = sample_frozen(cell, p)
        np.testing.assert_allclose(
            np.asarray(frozen), np.asarray(direct), rtol=1e-14
        )


def test_3d_cell_table_bit_matches_narrow_path():
    """The symmetric 3D cell table (one 48-f32 row per cell) reconstructs
    exactly the corner tensors the narrow 8-gather path reads."""
    X, F, _ = generate_uniform_rect_mesh(
        3, 6, 6, 6, 0, 1, 0, 1, 0, 1, NodeType.BOUNDARY_FIXED
    )
    grid = build_monitor_grid(X, get_monitor(3, 3))  # radial ring: varying
    assert not grid.constant
    assert grid.cell_table is not None and grid.cell_table.shape[-1] == 48
    from mmadmm_tpu.ops.monitor_grid import MonitorGrid

    narrow = MonitorGrid(values=grid.values, axes=grid.axes, cell_table=None)
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.uniform(0.02, 0.98, size=(40, 3)))
    for p in pts:
        ct = gather_cell(grid, p)
        nt = gather_cell(narrow, p)
        assert np.array_equal(np.asarray(ct["vals"]), np.asarray(nt["vals"]))
        for k in ("x0", "x1", "y0", "y1", "z0", "z1"):
            assert float(ct[k]) == float(nt[k])


def test_constant_monitor_grid_detected_and_bit_exact():
    """Identity monitor (the 3DMonitor1 family) -> constant grid flag; the
    broadcast fast path returns exactly what the gather path would."""
    X, F, _ = generate_uniform_rect_mesh(
        3, 5, 5, 5, 0, 1, 0, 1, 0, 1, NodeType.BOUNDARY_FIXED
    )
    grid = build_monitor_grid(X, get_monitor(3, 0))  # MEx0: identity
    assert grid.constant
    from mmadmm_tpu.ops.monitor_grid import MonitorGrid

    general = MonitorGrid(values=grid.values, axes=grid.axes, cell_table=None)
    rng = np.random.default_rng(2)
    pts = jnp.asarray(rng.uniform(0.0, 1.0, size=(20, 3)))
    for p in pts:
        cf = gather_cell(grid, p)
        cg = gather_cell(general, p)
        assert np.array_equal(np.asarray(cf["vals"]), np.asarray(cg["vals"]))
        for k in ("x0", "x1", "y0", "y1", "z0", "z1"):
            assert float(cf[k]) == float(cg[k])
        assert np.array_equal(
            np.asarray(sample_frozen(cf, p)), np.asarray(sample_frozen(cg, p))
        )


def test_frozen_extrapolation_is_continuous():
    """Moving slightly out of the frozen cell gives values continuous with
    the in-cell samples (linear extrapolation, no jumps)."""
    X, F, _ = generate_uniform_rect_mesh(
        2, 8, 8, 0, 0, 1, 0, 1, 0, 1, NodeType.BOUNDARY_FIXED
    )
    grid = build_monitor_grid(X, get_monitor(2, 1))
    p0 = jnp.asarray([0.49, 0.5])
    cell = gather_cell(grid, p0)
    eps = 1e-6
    hx = float(grid.axes[0][1] - grid.axes[0][0])
    # walk across the right cell face
    inside = sample_frozen(cell, p0.at[0].set(p0[0] + hx * (1 - eps)))
    outside = sample_frozen(cell, p0.at[0].set(p0[0] + hx * (1 + eps)))
    np.testing.assert_allclose(
        np.asarray(inside), np.asarray(outside), atol=1e-4
    )
