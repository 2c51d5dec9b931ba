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
