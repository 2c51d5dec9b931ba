"""Reproduce the Monitor1320 f32 divergence at small scale on CPU.

Runs a config at a given dtype for N steps and prints the Ih trace,
so dtype-sensitivity can be bisected cheaply off-TPU.
Usage: f32_diverge_probe.py <cfg> <dtype> <steps>
"""
import sys
sys.path.insert(0, "/root/repo")

cfg_name, dtype, steps = sys.argv[1], sys.argv[2], int(sys.argv[3])

from mmadmm_tpu.config import load_experiment_config
from mmadmm_tpu.problems import build_problem

cfg = load_experiment_config(
    f"/root/reference/Experiments/InputFiles/{cfg_name}.json"
)
cfg.dtype = dtype
mesh, integ = build_problem(cfg)
state = integ.init_state()
import time
t0 = time.perf_counter()
for i in range(steps):
    state, info = integ.step(state)
    ih = float(info.ih_start)
    print(f"step {i:4d} Ih={ih:.8f} iters={int(info.n_iters)} "
          f"primal={float(info.primal):.3g} dual={float(info.dual):.3g} "
          f"t={time.perf_counter()-t0:.1f}s", flush=True)
