"""Headline benchmark: MM-ADMM throughput on the largest 2D baseline config.

Reference baseline: Monitor1320 (409,600 triangles), 1000 ADMM time steps in
52.97 s single-thread C++ (`BASELINE.md`, `Results/Monitor1320/Ih0.txt`)
=> 18.88 steps/s. We measure jitted ADMM steps/s on this chip and report
`vs_baseline` = ours / reference (higher is better).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

REF_STEPS_PER_S = 1000.0 / 52.97  # Monitor1320, 1 thread (BASELINE.md)


def main() -> None:
    cfg_path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else "/root/reference/Experiments/InputFiles/Monitor1320.json"
    )
    n_meas = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    import jax

    from mmadmm_tpu.config import load_experiment_config
    from mmadmm_tpu.problems import build_problem

    cfg = load_experiment_config(cfg_path)
    cfg.dtype = "float32"  # TPU fast path; reductions stay f64
    mesh, integ = build_problem(cfg)

    chunk = 10
    state = integ.init_state()
    # warmup: compile + the expensive first steps (predictor grad path)
    for _ in range(3):
        state, info = integ.step(state)
    state, infos = integ.multi_step(state, chunk)  # compile the scan
    jax.block_until_ready(state.x)

    n_chunks = -(-n_meas // chunk)
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        state, infos = integ.multi_step(state, chunk)
    jax.block_until_ready(state.x)
    wall = time.perf_counter() - t0

    steps_per_s = n_chunks * chunk / wall
    print(
        json.dumps(
            {
                "metric": "admm_steps_per_s_monitor1320",
                "value": round(steps_per_s, 3),
                "unit": "steps/s",
                "vs_baseline": round(steps_per_s / REF_STEPS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
