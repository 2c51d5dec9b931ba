"""Structured-grid (stencil) 2D ADMM engine vs the stock element-major
step (``integrators/admm_grid2d.py``).

nx=16 gives 4*256 = 1024 dense elements (one kernel tile) and, for
Shoulder, 768 live + 256 dead elements — the carve masks, the
reorientation swap-select and the dead-element handling all execute.
Ih matches to ~1e-8 relative; ADMM iteration counts match. Residuals
differ at ~1e-3 relative because the kernel's per-TILE early exit makes
an element's Newton sweep count depend on its tile-mates, and the dense
engine packs tiles differently — the same variance class as the
documented pallas-vs-vmap backend differences.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from mmadmm_tpu.config import ExperimentConfig
from mmadmm_tpu.problems import build_problem


def _run(test_type: str, g2: bool, steps: int = 3):
    old = os.environ.get("MMADMM_GRID2D")
    try:
        os.environ["MMADMM_GRID2D"] = "1" if g2 else "0"
        cfg = ExperimentConfig(
            test_type=test_type, dim=2, mon_type=1, method=0,
            nx=16, ny=16, dt=5e-3, tau=0.1, rho=50.0,
            dtype="float32", prox_backend="pallas",
        )
        mesh, integ = build_problem(cfg)
        s = integ.init_state()
        out = []
        for _ in range(steps):
            s, info = integ.step(s)
            out.append((float(info.ih_start), int(info.n_iters)))
        return out, integ, s
    finally:
        if old is None:
            os.environ.pop("MMADMM_GRID2D", None)
        else:
            os.environ["MMADMM_GRID2D"] = old


@pytest.mark.slow
@pytest.mark.parametrize("test_type", ["SquareGrid", "Shoulder"])
def test_grid2d_matches_stock(test_type):
    a, integ_a, _ = _run(test_type, g2=False)
    b, integ_b, sb = _run(test_type, g2=True)
    assert type(integ_a).__name__ == "ADMMIntegrator"
    assert type(integ_b).__name__ == "GridADMM2D"
    for (ih_a, it_a), (ih_b, it_b) in zip(a, b):
        assert ih_a == pytest.approx(ih_b, rel=1e-7)
        assert it_a == it_b
    assert np.all(np.isfinite(np.asarray(sb.x)))


@pytest.mark.slow
def test_grid2d_multi_step_matches_stepwise():
    b1, _, _ = _run("Shoulder", g2=True, steps=2)
    old = os.environ.get("MMADMM_GRID2D")
    os.environ["MMADMM_GRID2D"] = "1"
    try:
        cfg = ExperimentConfig(
            test_type="Shoulder", dim=2, mon_type=1, method=0,
            nx=16, ny=16, dt=5e-3, tau=0.1, rho=50.0,
            dtype="float32", prox_backend="pallas",
        )
        _, integ = build_problem(cfg)
        s = integ.init_state()
        s, infos = integ.multi_step(s, 2)
        for (ih_a, _), ih_b in zip(b1, np.asarray(infos.ih_start)):
            assert ih_a == pytest.approx(float(ih_b), rel=1e-7)
    finally:
        if old is None:
            os.environ.pop("MMADMM_GRID2D", None)
        else:
            os.environ["MMADMM_GRID2D"] = old
