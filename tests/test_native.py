"""Native C++ kernel tests (grid-hash NN, glibc rand) vs Python/SciPy
oracles."""

import numpy as np
import pytest

from mmadmm_tpu.runtime.native import (
    glibc_rand_fill,
    grid_nn_map,
    native_available,
)

needs_native = pytest.mark.skipif(
    not native_available(), reason="native library not built"
)


@needs_native
@pytest.mark.parametrize("D", [2, 3])
def test_grid_nn_matches_kdtree(D):
    from scipy.spatial import cKDTree

    rng = np.random.default_rng(0)
    X = rng.random((500, D))
    lo, hi = X.min(axis=0), X.max(axis=0)
    n = 12
    nn = grid_nn_map(X, lo, hi, n)

    axes = [lo[d] + np.arange(n + 1) * (hi[d] - lo[d]) / n for d in range(D)]
    if D == 2:
        gx, gy = np.meshgrid(axes[0], axes[1], indexing="xy")
        q = np.stack([gx.ravel(), gy.ravel()], axis=1)
    else:
        gz, gy, gx = np.meshgrid(axes[2], axes[1], axes[0], indexing="ij")
        q = np.stack([gx.ravel(), gy.ravel(), gz.ravel()], axis=1)
    d_ref, _ = cKDTree(X).query(q)
    d_native = np.linalg.norm(X[nn] - q, axis=1)
    # indices may differ on exact ties; distances must match
    np.testing.assert_allclose(d_native, d_ref, rtol=1e-12, atol=1e-12)


@needs_native
def test_glibc_rand_matches_python():
    from mmadmm_tpu.geometry.glibc_rand import GlibcRand

    ref = GlibcRand(69).rand_array(1000)
    nat = glibc_rand_fill(69, 1000)
    np.testing.assert_array_equal(np.asarray(ref), nat)


def test_monitor_grid_build_uses_nn_correctly():
    """End check: grid built through grid_nn_map (native or fallback)
    reproduces monitor values at vertex-coincident grid nodes."""
    from mmadmm_tpu.geometry.node_type import NodeType
    from mmadmm_tpu.geometry.rect_mesh import generate_uniform_rect_mesh
    from mmadmm_tpu.monitors import get_monitor
    from mmadmm_tpu.ops.monitor_grid import build_monitor_grid

    X, F, mask = generate_uniform_rect_mesh(
        2, 6, 6, 0, 0, 1, 0, 1, 0, 1, NodeType.BOUNDARY_FIXED
    )
    grid = build_monitor_grid(X, get_monitor(2, 1), num_smooth=0)
    v = np.asarray(grid.values)
    assert np.isfinite(v).all()
    # corner grid node (0,0) coincides with mesh vertex at (0,0)
    mon = get_monitor(2, 1)(np.array([[0.0, 0.0]]))[0]
    np.testing.assert_allclose(v[0, 0].reshape(2, 2), mon, rtol=1e-12)
