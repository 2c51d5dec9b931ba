"""Explicit Euler on the stencil engine (``ops/dense_eg2d.py``) vs the
stock element-major eulerStepMod path.

Same comparison class as tests/test_grid2d.py: nx=16 gives 1024 dense
elements (one kernel tile); Shoulder exercises the carve masks and the
reorientation swap-select. The eg evaluation is a pure reordering of the
same per-element kernel math, so the trajectories agree to f32
round-off (the commit-time manual check saw one-ulp agreement over 4
steps; the test allows a small multiple of that).

Ref: ``Mesh::eulerStepMod`` Mesh.cpp:533-579 (what both paths compute).
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from mmadmm_tpu.config import ExperimentConfig
from mmadmm_tpu.problems import build_problem


def _run(test_type: str, grid: bool, steps: int = 4):
    old = os.environ.get("MMADMM_EULER_GRID")
    try:
        os.environ["MMADMM_EULER_GRID"] = "1" if grid else "0"
        cfg = ExperimentConfig(
            test_type=test_type, dim=2, mon_type=1, method=1,
            nx=16, ny=16, dt=5e-3, tau=0.1, rho=50.0,
            dtype="float32",
        )
        mesh, integ = build_problem(cfg)
        if grid:
            assert integ._grid2d is not None, (
                "grid eg path did not engage under MMADMM_EULER_GRID=1"
            )
        else:
            assert integ._grid2d is None
        s = integ.init_state()
        ihs = []
        for _ in range(steps):
            s, ih = integ.step(s)
            ihs.append(ih)
        return np.asarray(s.x), np.asarray(ihs)
    finally:
        if old is None:
            os.environ.pop("MMADMM_EULER_GRID", None)
        else:
            os.environ["MMADMM_EULER_GRID"] = old


@pytest.mark.parametrize("test_type", ["SquareGrid", "Shoulder"])
def test_euler_grid_matches_stock(test_type):
    x_a, ih_a = _run(test_type, grid=False)
    x_b, ih_b = _run(test_type, grid=True)
    np.testing.assert_allclose(ih_b, ih_a, rtol=1e-6)
    np.testing.assert_allclose(x_b, x_a, rtol=0, atol=1e-6)
    assert np.all(np.isfinite(x_b))
