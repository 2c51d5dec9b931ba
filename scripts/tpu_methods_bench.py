"""TPU timing for the two baseline integrators (methods 1 = explicit
Euler, 2 = backward Euler) — the reference's own cross-validation
methods, timed against its recorded traces
(Results/<cfg>/Ih{1,2}.txt: wall seconds, Ih per step).

Appends results to Results/tpu_bench.json as "<cfg>_m<method>".
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (ref seconds to its stop, ref final Ih) from Ih<m>.txt last rows
REF = {
    ("Monitor1320", 1): (124.9, 0.813164),
    ("Monitor1320", 2): (335.8, 0.813164),
    ("Monitor1160", 1): (29.685, 0.813164),
    ("Monitor1160", 2): (75.956, 0.813164),
    ("Monitor140", 1): (0.4194, 0.813163),
    ("Monitor140", 2): (1.19467, 0.813162),
    ("Monitor120", 1): (0.0991, 0.813163),
    ("Monitor120", 2): (0.2792, 0.813163),
    ("3DMonitor110", 1): (1.224, 1.55916),
    ("3DMonitor110", 2): (4.871, 1.55909),
}

name = sys.argv[1] if len(sys.argv) > 1 else "Monitor1320"
methods = [int(m) for m in sys.argv[2:]] or [1, 2]

from mmadmm_tpu.config import load_experiment_config
from mmadmm_tpu.problems import build_problem
from mmadmm_tpu.runtime.cache import enable_persistent_cache

enable_persistent_cache()
import jax

for method in methods:
    cfg = load_experiment_config(
        f"/root/reference/Experiments/InputFiles/{name}.json"
    )
    cfg.method = method
    cfg.dtype = "float32"
    mesh, integ = build_problem(cfg)
    # scan K steps per dispatch; the tunnel's per-dispatch round trip is
    # ~100-250 ms, so small problems need big chunks
    chunk = 25 if method == 1 else 4
    state = integ.init_state()
    t0 = time.perf_counter()
    state, _ = integ.multi_step(state, chunk)
    jax.block_until_ready(state.x)
    print(f"m{method}: compile+first {time.perf_counter()-t0:.1f}s",
          flush=True)

    ref_s, ref_ih = REF.get((name, method), (None, None))
    state = integ.init_state()
    ih_prev = None
    t_target = None
    t0 = time.perf_counter()
    steps = 0
    done = False
    while steps < cfg.n_steps and not done:
        state, ihs = integ.multi_step(state, chunk)
        now = time.perf_counter() - t0
        for ih in [float(v) for v in ihs]:
            steps += 1
            if ref_ih is not None:
                if ih <= ref_ih:
                    if t_target is None:
                        t_target = now
                else:
                    t_target = None
            if (ih_prev is not None
                    and abs((ih - ih_prev) / cfg.dt) < cfg.dt_tol):
                done = True
                break
            ih_prev = ih
        if steps % 100 < chunk:
            print(f"m{method}: step {steps} ih {ih:.6f} (+{now:.1f}s)",
                  flush=True)
    jax.block_until_ready(state.x)
    wall = time.perf_counter() - t0
    print(
        f"m{method}: stop at {wall:.2f}s / {steps} steps, final {ih:.6f}; "
        f"ref quality ({ref_ih}) at {t_target}s vs ref {ref_s}s",
        flush=True,
    )
    rec_path = os.path.join(REPO, "Results", "tpu_bench.json")
    records = {}
    if os.path.exists(rec_path):
        with open(rec_path) as f:
            records = json.load(f)
    t_cmp = t_target if t_target is not None else wall
    records[f"{name}_m{method}"] = {
        "t_to_ref_quality_s": None if t_target is None else round(t_target, 3),
        "t_dttol_stop_s": round(wall, 3),
        "steps": steps,
        "final_ih": ih,
        "ref_seconds": ref_s,
        "ref_final_ih": ref_ih,
        "vs_baseline": None if ref_s is None else round(ref_s / t_cmp, 3),
        "measured_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    os.makedirs(os.path.dirname(rec_path), exist_ok=True)
    with open(rec_path, "w") as f:
        json.dump(records, f, indent=1, sort_keys=True)
