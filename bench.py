"""Headline benchmark: MM-ADMM time-to-convergence on the largest 2D
baseline config (Monitor1320, 307,200 triangles after the shoulder cut).

Reference baseline: the recorded trace `Results/Monitor1320/Ih0.txt` —
~108 ADMM time steps to the DtTol stop in 52.97 s single-thread C++
(`BASELINE.md`). We run the same config with the same DtTol stop on this
chip (f32 fast path, chunked steps) and report wall seconds;
`vs_baseline` = reference_time / our_time (higher is better).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

REF_SECONDS = 52.97  # Monitor1320 time-to-converge, 1-thread C++


def main() -> None:
    cfg_path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else "/root/reference/Experiments/InputFiles/Monitor1320.json"
    )

    import jax

    from mmadmm_tpu.config import load_experiment_config
    from mmadmm_tpu.problems import build_problem
    from mmadmm_tpu.runtime.cache import enable_persistent_cache

    enable_persistent_cache()

    cfg = load_experiment_config(cfg_path)
    cfg.dtype = "float32"  # TPU fast path; reductions stay f64-accurate
    mesh, integ = build_problem(cfg)

    chunk = 8
    state = integ.init_state()
    # compile the chunked-step program before timing (the reference's timer
    # also excludes its build; main.cpp:176 starts after setup). Only
    # multi_step is used in the timed loop — compiling integ.step too would
    # double the (multi-minute, remote) TPU compile for nothing.
    _s, _ = integ.multi_step(state, chunk)
    jax.block_until_ready(_s.x)

    state = integ.init_state()
    t0 = time.perf_counter()
    ih_prev = None
    steps = 0
    done = False
    while steps < cfg.n_steps and not done:
        state, infos = integ.multi_step(state, chunk)
        for ih in [float(v) for v in infos.ih_start]:
            steps += 1
            if ih_prev is not None and abs((ih - ih_prev) / cfg.dt) < cfg.dt_tol:
                done = True
                break
            ih_prev = ih
    jax.block_until_ready(state.x)
    wall = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "metric": "monitor1320_time_to_converge",
                "value": round(wall, 2),
                "unit": f"s ({steps} steps, final_ih={ih_prev:.6g})",
                "vs_baseline": round(REF_SECONDS / wall, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
