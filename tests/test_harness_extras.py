"""outputX/outputZ debug dumps + boundary-point plot (reference
MeshIntegrator.cpp:219-246, plot.py mode 3)."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from mmadmm_tpu.config import ExperimentConfig  # noqa: E402
from mmadmm_tpu.problems import build_problem  # noqa: E402


def test_output_x_z_dumps(tmp_path):
    cfg = ExperimentConfig(
        test_type="SquareGrid", dim=2, mon_type=1, method=0,
        nx=4, ny=4, dt=5e-3, tau=0.1, rho=50.0,
    )
    mesh, integ = build_problem(cfg)
    s = integ.init_state()
    s, _ = integ.step(s)
    fx = integ.output_x(s, str(tmp_path / "x.txt"))
    fz = integ.output_z(s, str(tmp_path / "z.txt"))
    x = np.genfromtxt(fx, delimiter=",")
    z = np.genfromtxt(fz, delimiter=",")
    assert x.shape == (mesh.n_pnts, 2)
    assert z.shape == (mesh.n_elements * 3, 2)  # z->rows()/D rows
    np.testing.assert_allclose(x, np.asarray(s.x), rtol=1e-15)
    np.testing.assert_allclose(
        z, np.asarray(mesh.gather(s.x)).reshape(-1, 2), rtol=1e-15
    )


def test_boundary_point_plot(tmp_path):
    from mmadmm_tpu.harness.plotting import plot_boundary_points

    cfg = ExperimentConfig(
        test_type="SquareGrid", dim=2, mon_type=1, method=0,
        nx=4, ny=4, dt=5e-3, tau=0.1, rho=50.0,
    )
    mesh, _ = build_problem(cfg)
    out = plot_boundary_points(
        mesh.X0, mesh.mask_np, str(tmp_path / "b.png")
    )
    assert os.path.getsize(out) > 0
