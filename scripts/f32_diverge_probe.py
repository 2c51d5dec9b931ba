"""Stability probe: run a config for N steps printing the Ih trace.

Usage: f32_diverge_probe.py <cfg> <dtype> <steps> [stop_tol] [prox_tol] [iters]
Overrides let the ADMM stop tolerance / prox tolerance / iteration cap be
swept independently to locate the stability boundary at production scales.
"""
import sys
sys.path.insert(0, "/root/repo")

cfg_name, dtype, steps = sys.argv[1], sys.argv[2], int(sys.argv[3])
stop_tol = float(sys.argv[4]) if len(sys.argv) > 4 else None
prox_tol = float(sys.argv[5]) if len(sys.argv) > 5 else None
iters = int(sys.argv[6]) if len(sys.argv) > 6 else None

from mmadmm_tpu.config import load_experiment_config
from mmadmm_tpu.problems import build_problem

cfg = load_experiment_config(
    f"/root/reference/Experiments/InputFiles/{cfg_name}.json"
)
cfg.dtype = dtype
if stop_tol is not None:
    cfg.step_tol = stop_tol
if iters is not None:
    cfg.admm_iter = iters
mesh, integ = build_problem(cfg)
if prox_tol is not None:
    from mmadmm_tpu.integrators.admm import ADMMIntegrator
    integ = ADMMIntegrator(
        mesh, cfg.dt, admm_iters=cfg.admm_iter, tol=cfg.step_tol,
        prox_tol=prox_tol, prox_max_iters=cfg.prox_newton_iters,
        grad_use=cfg.grad_use,
    )
state = integ.init_state()
import time
t0 = time.perf_counter()
ih_prev = float("inf")
for i in range(steps):
    state, info = integ.step(state)
    ih = float(info.ih_start)
    print(f"step {i:4d} Ih={ih:.8f} iters={int(info.n_iters)} "
          f"primal={float(info.primal):.3g} dual={float(info.dual):.3g} "
          f"t={time.perf_counter()-t0:.1f}s", flush=True)
    if i != 0 and abs((ih - ih_prev) / cfg.dt) < cfg.dt_tol:
        print("converged", flush=True)
        break
    ih_prev = ih
