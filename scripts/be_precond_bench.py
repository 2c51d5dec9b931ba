"""Backward-Euler Jacobi preconditioner effect (VERDICT r1 item 5).

Runs Monitor1160 method 2 for a few steps with and without the exact
Hessian-diagonal Jacobi preconditioner and reports wall time per step.
(jax.scipy's bicgstab does not expose iteration counts, so wall time of
the jitted step is the recordable metric.)
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
from mmadmm_tpu.config import load_experiment_config
from mmadmm_tpu.problems import build_problem
from mmadmm_tpu.integrators.backward_euler import BackwardEulerIntegrator

cfg = load_experiment_config(
    "/root/reference/Experiments/InputFiles/Monitor1160.json"
)
cfg.method = 2
mesh, _ = build_problem(cfg)

for label, pre in (("jacobi", True), ("none", False)):
    integ = BackwardEulerIntegrator(
        mesh, cfg.dt, tol=cfg.step_tol, precondition=pre
    )
    state = integ.init_state()
    state, ih = integ.step(state)  # compile
    t0 = time.perf_counter()
    n = 5
    for _ in range(n):
        state, ih = integ.step(state)
    wall = time.perf_counter() - t0
    print(f"{label}: {wall/n:.2f} s/step, Ih={ih:.6f}", flush=True)
