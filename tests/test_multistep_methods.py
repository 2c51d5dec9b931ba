"""Euler/BE multi_step (scan-chunked) must match step-wise execution."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from mmadmm_tpu.config import ExperimentConfig  # noqa: E402
from mmadmm_tpu.problems import build_problem  # noqa: E402


@pytest.mark.parametrize("method", [1, 2], ids=["euler", "backward_euler"])
def test_multi_step_matches_stepwise(method):
    cfg = ExperimentConfig(
        test_type="SquareGrid", dim=2, mon_type=1, method=method,
        nx=8, ny=8, dt=5e-3, tau=0.1, rho=50.0,
    )
    _, integ = build_problem(cfg)
    s1 = integ.init_state()
    ihs_a = []
    for _ in range(6):
        s1, ih = integ.step(s1)
        ihs_a.append(ih)
    s2 = integ.init_state()
    s2, ihs_b = integ.multi_step(s2, 6)
    np.testing.assert_allclose(ihs_a, np.asarray(ihs_b), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(s1.x), np.asarray(s2.x), rtol=1e-12
    )
