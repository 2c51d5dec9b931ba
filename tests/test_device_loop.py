"""The whole-run device loop must reproduce the host outer loop exactly:
same steps-taken at the DtTol stop, same energy trace, same final state
(``integrators/device_loop.py`` vs ``run()``)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from mmadmm_tpu.config import ExperimentConfig  # noqa: E402
from mmadmm_tpu.problems import build_problem  # noqa: E402


def _cfg(method):
    return ExperimentConfig(
        test_type="SquareGrid", dim=2, mon_type=1, method=method,
        nx=8, ny=8, dt=5e-3, tau=0.1, rho=50.0,
    )


@pytest.mark.parametrize("method", [0, 1, 2], ids=["admm", "euler", "be"])
def test_run_device_matches_host_loop(method):
    dt_tol = 20.0  # loose so the stop fires after a handful of steps
    cap = 40

    _, integ = build_problem(_cfg(method))
    s_host = integ.init_state()
    s_host, trace_host = integ.run(cap, dt_tol, state=s_host)
    # run() prepends the initial energy; per-step trace is [1:]
    steps_host = len(trace_host) - 1

    _, integ2 = build_problem(_cfg(method))
    s_dev = integ2.init_state()
    s_dev, trace_dev, steps_dev = integ2.run_device(
        s_dev, cap=cap, dt_tol=dt_tol
    )
    steps_dev = int(steps_dev)
    assert steps_dev == steps_host
    np.testing.assert_allclose(
        np.asarray(trace_dev)[:steps_dev], trace_host[1:], rtol=1e-12
    )
    assert np.all(np.isnan(np.asarray(trace_dev)[steps_dev:]))
    np.testing.assert_allclose(
        np.asarray(s_dev.x), np.asarray(s_host.x), rtol=1e-12
    )


def test_run_device_target_stop_and_min_steps():
    _, integ = build_problem(_cfg(0))
    s = integ.init_state()
    s, trace, steps = integ.run_device(s, cap=30, dt_tol=0.0)
    trace = np.asarray(trace)
    assert int(steps) == 30  # dt_tol=0 never stops
    target = float(trace[4])

    s2 = integ.init_state()
    _, tr2, st2 = integ.run_device(s2, cap=30, dt_tol=0.0, target_ih=target)
    # energies decrease on this config: first touch is step 5 (1-based)
    assert int(st2) == 5
    np.testing.assert_allclose(np.asarray(tr2)[:5], trace[:5], rtol=1e-12)

    s3 = integ.init_state()
    _, _, st3 = integ.run_device(
        s3, cap=30, dt_tol=0.0, target_ih=target, min_steps=9
    )
    assert int(st3) == 9  # armed late: stops at min_steps (ih still below)


@pytest.mark.slow
def test_run_device_sharded_matches_single():
    from mmadmm_tpu.parallel import make_device_mesh

    cfg = _cfg(0)
    _, integ1 = build_problem(cfg)
    s1 = integ1.init_state()
    _, tr1, st1 = integ1.run_device(s1, cap=12, dt_tol=0.0)

    cfg.n_devices = 4
    _, integ4 = build_problem(cfg)
    s4 = integ4.init_state()
    _, tr4, st4 = integ4.run_device(s4, cap=12, dt_tol=0.0)
    assert int(st1) == int(st4) == 12
    np.testing.assert_allclose(
        np.asarray(tr1), np.asarray(tr4), rtol=1e-9
    )


def test_run_device_stop_on_rise():
    """The rise stop (the recorded-artifact rule — the commented-out
    `|| dIdt > 0` clause, main.cpp:204) ends the run at the first energy
    increase; without it the same run continues."""
    # explicit Euler at dt/tau = 0.8: overshoots, energy rises at step ~8
    cfg = ExperimentConfig(
        test_type="SquareGrid", dim=2, mon_type=1, method=1,
        nx=8, ny=8, dt=0.08, tau=0.1, rho=50.0,
    )
    _, integ = build_problem(cfg)
    s = integ.init_state()
    _, trace, steps = integ.run_device(s, cap=40, dt_tol=0.0)
    tr = np.asarray(trace)[: int(steps)]
    rises = np.nonzero(np.diff(tr) > 0)[0]
    assert rises.size > 0
    first_rise = int(rises[0]) + 2  # steps taken when the rise lands
    s2 = integ.init_state()
    _, tr2, st2 = integ.run_device(
        s2, cap=40, dt_tol=0.0, stop_on_rise=True
    )
    assert int(st2) == first_rise
    np.testing.assert_allclose(
        np.asarray(tr2)[:first_rise], tr[:first_rise], rtol=1e-12
    )
