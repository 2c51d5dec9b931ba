"""Pallas prox kernel (ops/prox_pallas.py) vs the vmapped reference solver.

Both backends consume the same per-element closures
(``ops.prox.make_element_kernels``); this checks the SoA tile layout,
padding, and per-tile while-loop deliver the same per-element results
(up to f32 fusion-order noise — interpret mode on CPU).
"""

import jax
import numpy as np
import pytest

from mmadmm_tpu.config import ExperimentConfig
from mmadmm_tpu.problems import build_problem


def _prox_inputs(cfg):
    mesh, integ = build_problem(cfg)
    state = integ.init_state()
    state, _ = integ.step(state)
    state, _ = integ.step(state)  # realistic mid-run state
    z = mesh.gather(state.x)
    dxpu = z + state.u_bar
    return mesh, z, dxpu


@pytest.mark.parametrize(
    "dim,nx",
    [(2, 10), (3, 4)],
    ids=["2d", "3d"],
)
@pytest.mark.slow
def test_pallas_prox_matches_vmap(dim, nx):
    cfg = ExperimentConfig(
        test_type="SquareGrid", dim=dim, mon_type=1, method=0,
        nx=nx, ny=nx, nz=nx, dt=5e-3, tau=0.1, rho=50.0,
        dtype="float32", prox_backend="vmap",
    )
    mesh, z, dxpu = _prox_inputs(cfg)
    tol, iters = 1e-5, 50

    z1, ih1 = mesh.prox(z, mesh.xi, dxpu, mesh.elem_free, tol, iters)

    from mmadmm_tpu.ops.prox_pallas import make_prox_pallas

    pp = make_prox_pallas(
        mesh.ehat, mesh.comp_mesh, mesh.w, mesh.dim, interpret=True
    )
    z2, ih2 = pp(mesh.grid, z, mesh.xi, dxpu, mesh.elem_free, tol, iters)

    np.testing.assert_allclose(
        np.asarray(ih1), np.asarray(ih2), rtol=0, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(z1), np.asarray(z2), rtol=0, atol=1e-6
    )


@pytest.mark.tpu
@pytest.mark.slow
def test_pallas_on_tpu_executes_and_matches():
    """Runs the Pallas kernel NON-interpreted on the real chip (the
    interpret-mode tests above only prove the math, not that Mosaic
    compiles it). Subprocess: the conftest pins this process to CPU, so
    the shootout script runs with the default (axon TPU) platform.
    Invoke manually: python -m pytest -m tpu tests/test_prox_pallas.py"""
    import os
    import subprocess
    import sys

    if os.environ.get("PALLAS_AXON_POOL_IPS") is None:
        pytest.skip("no TPU tunnel in this environment")
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    out = subprocess.run(
        [sys.executable, "-u", "scripts/tpu_prox_bench.py", "Monitor120"],
        cwd="/root/repo", env=env, capture_output=True, text=True,
        timeout=3000,
    )
    assert "PROX_BENCH_RESULT OK" in out.stdout, (
        f"stdout:\n{out.stdout}\nstderr:\n{out.stderr[-2000:]}"
    )


def test_pallas_backend_requires_f32():
    cfg = ExperimentConfig(
        test_type="SquareGrid", dim=2, mon_type=1, method=0,
        nx=6, ny=6, dt=5e-3, tau=0.1, rho=50.0,
        dtype="float64", prox_backend="pallas",
    )
    with pytest.raises(ValueError, match="float32"):
        build_problem(cfg)
