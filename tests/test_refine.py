"""Midpoint refinement (geometry/refine.py) + the CircleEx192r stand-in."""

import numpy as np
import pytest

from mmadmm_tpu.geometry.node_type import NodeType
from mmadmm_tpu.geometry.refine import refine_triangle_mesh


def test_refine_square():
    # two triangles on the unit square
    X = np.array([[0.0, 0], [1, 0], [1, 1], [0, 1]])
    F = np.array([[0, 1, 2], [0, 2, 3]])
    mask = np.full(4, int(NodeType.BOUNDARY_FIXED))
    Xn, Fn, mn = refine_triangle_mesh(X, F, mask)
    assert Fn.shape == (8, 3)
    assert Xn.shape == (4 + 5, 2)  # 5 unique edges
    # boundary-edge midpoints fixed; the diagonal midpoint interior
    n_fixed = (mn == NodeType.BOUNDARY_FIXED).sum()
    assert n_fixed == 4 + 4
    assert (mn == NodeType.INTERIOR).sum() == 1
    # orientation: every child has the same signed area sign as parents
    def signed_area(X, F):
        a, b, c = X[F[:, 0]], X[F[:, 1]], X[F[:, 2]]
        return np.cross(b - a, c - a)
    assert np.all(np.sign(signed_area(Xn, Fn)) == 1.0)
    # total area preserved
    np.testing.assert_allclose(signed_area(Xn, Fn).sum(), 1.0 * 2)


@pytest.mark.slow
def test_circle_ex192r_generates():
    import os
    import tempfile

    if not os.path.isdir("/root/reference"):
        pytest.skip("no reference checkout")
    from mmadmm_tpu.config import load_experiment_config
    from mmadmm_tpu.geometry.refine import make_circle_ex192r
    from mmadmm_tpu.problems import build_geometry

    with tempfile.TemporaryDirectory() as d:
        cfg_path = make_circle_ex192r(d)
        cfg = load_experiment_config(cfg_path)
        X, F, mask, _ = build_geometry(cfg)
        assert F.shape[0] == 4 * 66251
        assert X.shape[0] == 133116
        # the same boundary-node count scaling as the lost mesh's mask
        # (1215 fixed rows recorded): ours has 613 originals + 613 edge
        # midpoints
        assert (mask == NodeType.BOUNDARY_FIXED).sum() == 613 + 613
        r = np.hypot(X[:, 0], X[:, 1])
        assert r.max() <= 1.0 + 1e-12
