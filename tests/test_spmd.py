"""SPMD-specific tests: sharded multi_step, 3D sharding, odd element counts."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from mmadmm_tpu.config import ExperimentConfig  # noqa: E402
from mmadmm_tpu.problems import build_problem  # noqa: E402


def build(n_devices, dim=2, nx=6):
    cfg = ExperimentConfig(
        name="spmd", test_type="SquareGrid", dim=dim, mon_type=1, method=0,
        nx=nx, ny=nx, nz=nx, dt=5e-3, tau=0.1, rho=50.0,
        n_devices=n_devices,
    )
    return build_problem(cfg)


def run_k(integ, k):
    state = integ.init_state()
    out = []
    for _ in range(k):
        state, info = integ.step(state)
        out.append(float(info.ih_start))
    return out


@pytest.mark.slow
def test_sharded_multi_step_matches_stepwise():
    _, integ = build(4)
    s1 = integ.init_state()
    for _ in range(4):
        s1, i1 = integ.step(s1)
    s2 = integ.init_state()
    s2, infos = integ.multi_step(s2, 4)
    np.testing.assert_allclose(
        float(i1.ih_start), float(infos.ih_start[-1]), rtol=1e-12
    )
    np.testing.assert_allclose(np.asarray(s1.x), np.asarray(s2.x), rtol=1e-12)


@pytest.mark.slow
def test_sharded_3d_matches_single():
    _, integ1 = build(1, dim=3, nx=3)
    _, integ8 = build(8, dim=3, nx=3)
    np.testing.assert_allclose(run_k(integ1, 3), run_k(integ8, 3), rtol=1e-12)


@pytest.mark.slow
def test_halo_matches_full_psum():
    """Owner-computes halo step == full-field all-reduce step to reduction
    order (same contributors per node sum), incl. ADMM iteration counts."""
    from mmadmm_tpu.integrators.admm import ADMMIntegrator
    from mmadmm_tpu.parallel import make_device_mesh

    mesh, _ = build(1)
    dmesh = make_device_mesh(4)
    kw = dict(admm_iters=10, tol=1e-3, device_mesh=dmesh)
    integ_halo = ADMMIntegrator(mesh, 5e-3, halo=True, **kw)
    integ_full = ADMMIntegrator(mesh, 5e-3, halo=False, **kw)
    sh, sf = integ_halo.init_state(), integ_full.init_state()
    for _ in range(4):
        sh, ih = integ_halo.step(sh)
        sf, if_ = integ_full.step(sf)
        assert int(ih.n_iters) == int(if_.n_iters)
        np.testing.assert_allclose(
            float(ih.ih_start), float(if_.ih_start), rtol=1e-13
        )
    np.testing.assert_allclose(
        np.asarray(sh.x), np.asarray(sf.x), rtol=1e-12, atol=1e-15
    )


@pytest.mark.slow
def test_sharded_uneven_padding():
    # 6x6 shoulder-free rect: 144 elements; 144 % 5 != 0 -> padding path
    _, integ1 = build(1)
    _, integ5 = build(5)
    np.testing.assert_allclose(run_k(integ1, 3), run_k(integ5, 3), rtol=1e-12)
