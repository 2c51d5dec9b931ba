"""Multi-process (multi-host simulation) test: ``initialize_multihost`` +
the sharded ADMM step compose, and the distributed run reproduces the
single-process result.

The reference has no distributed capability at all (SURVEY §2.3: OpenMP
only); this exercises the framework's jax.distributed backend with 2 OS
processes x 4 virtual CPU devices (Gloo collectives), the documented
CPU-cluster equivalent of a TPU pod slice.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _parse(log: str):
    ihs, iters = [], []
    for line in log.splitlines():
        if line.startswith("IH "):
            _, ih, it = line.split()
            ihs.append(float(ih))
            iters.append(int(it))
    return ihs, iters


@pytest.mark.slow
def test_two_process_run_matches_single_process():
    port = _free_port()
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    procs = [
        subprocess.Popen(
            [sys.executable, "-u", WORKER, str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"
        assert "WORKER DONE" in out, out

    traces = [_parse(out) for out in outs]
    # both processes read identical replicated results
    assert traces[0] == traces[1]

    # single-process 8-device run of the same problem (the conftest gives
    # this process 8 virtual devices)
    from mmadmm_tpu.config import ExperimentConfig
    from mmadmm_tpu.problems import build_problem

    cfg = ExperimentConfig(
        test_type="SquareGrid", dim=2, mon_type=1, method=0,
        nx=8, ny=8, dt=5e-3, tau=0.1, rho=50.0,
        dtype="float64", n_devices=8,
    )
    mesh, integ = build_problem(cfg)
    state = integ.init_state()
    ihs, iters = [], []
    for _ in range(3):
        state, info = integ.step(state)
        ihs.append(float(info.ih_start))
        iters.append(int(info.n_iters))

    mh_ihs, mh_iters = traces[0]
    assert mh_iters == iters
    np.testing.assert_allclose(mh_ihs, ihs, rtol=1e-12)
