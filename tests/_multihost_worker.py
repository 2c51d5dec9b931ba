"""Worker for the multi-process (multi-host simulation) test.

Launched by tests/test_multihost.py as 2 OS processes x 4 virtual CPU
devices each; brings up jax.distributed, builds the sharded ADMM problem
over the global 8-device mesh, runs 3 steps and prints the Ih trace.
The parent compares against its own single-process 8-device run.

Usage: python tests/_multihost_worker.py <process_id> <num_processes> <port>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    import jax

    from mmadmm_tpu.parallel.spmd import initialize_multihost

    initialize_multihost(f"127.0.0.1:{port}", nproc, pid)
    assert jax.process_count() == nproc
    n_dev = jax.device_count()
    print(f"WORKER {pid}: {n_dev} global devices, "
          f"{len(jax.local_devices())} local", flush=True)

    from mmadmm_tpu.config import ExperimentConfig
    from mmadmm_tpu.problems import build_problem

    cfg = ExperimentConfig(
        test_type="SquareGrid", dim=2, mon_type=1, method=0,
        nx=8, ny=8, dt=5e-3, tau=0.1, rho=50.0,
        dtype="float64", n_devices=n_dev,
    )
    mesh, integ = build_problem(cfg)
    state = integ.init_state()
    for _ in range(3):
        state, info = integ.step(state)
        print(f"IH {float(info.ih_start):.17g} {int(info.n_iters)}",
              flush=True)
    jax.block_until_ready(state.x)
    print("WORKER DONE", flush=True)


if __name__ == "__main__":
    main()
