"""Experiment runner: the outer time loop with trace/artifact logging.

Mirrors ``runAlgo<D>`` (reference ``main.cpp:142-255``):

* run the chosen integrator for ``nSteps`` outer steps,
* record ``(wall-seconds, Ih)`` per step — column format of the recorded
  baselines (``Results/<cfg>/Ih<m>.txt``, written at ``main.cpp:238-248``),
* stop early when ``|Ih - IhPrev| / dt < DtTol`` (``main.cpp:200-208``),
* write ``points.txt`` / ``triangles.txt`` / ``Ih<method>.txt`` to the
  output directory (``main.cpp:227-248``),
* report phase timings (the reference's proxTime/predTime counters,
  ``MeshIntegrator.h:24-27`` — here: setup/compile/step wall times).

Extensions over the reference: ``step_chunk`` runs K outer steps per device
program (lax.scan) to amortize dispatch latency — the DtTol stop is then
checked once per chunk; checkpoint/resume via ``harness.checkpoint``.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

import numpy as np

from ..config import ExperimentConfig
from ..geometry import io as mesh_io
from ..problems import build_problem


@dataclass
class RunResult:
    name: str
    method: int
    ih_trace: list = field(default_factory=list)
    t_trace: list = field(default_factory=list)
    n_steps: int = 0
    converged: bool = False
    failed: bool = False  # non-finite energy watchdog tripped
    setup_time: float = 0.0
    compile_time: float = 0.0
    loop_time: float = 0.0
    final_ih: float = float("nan")
    n_elements: int = 0

    def summary(self) -> dict:
        return {
            "name": self.name,
            "method": self.method,
            "n_steps": self.n_steps,
            "converged": self.converged,
            "failed": self.failed,
            "final_ih": self.final_ih,
            "setup_time": self.setup_time,
            "compile_time": self.compile_time,
            "loop_time": self.loop_time,
        }


def run_experiment(
    cfg: ExperimentConfig,
    out_dir: str | None = None,
    base_dir: str | None = None,
    step_chunk: int = 1,
    verbose: bool = False,
    checkpoint_every: int = 0,
    resume_from: str | None = None,
) -> RunResult:
    """Build the problem and run it to convergence; optionally write the
    reference-format artifacts into ``out_dir``.

    ``resume_from``: path to a ``harness.checkpoint`` file — the run picks
    up that checkpoint's config, integrator state, outer step index, and
    DtTol comparator instead of starting fresh."""
    import jax

    t0 = time.perf_counter()
    start_step, ih_prev0 = 0, float("inf")
    if resume_from is not None:
        from .checkpoint import checkpoint_meta, resume_experiment

        cfg, mesh, integ, state = resume_experiment(
            resume_from, base_dir or "."
        )
        start_step, ih_prev0 = checkpoint_meta(resume_from)
    else:
        mesh, integ = build_problem(cfg, base_dir)
        state = integ.init_state()
    res = RunResult(name=cfg.name, method=cfg.method)
    res.setup_time = time.perf_counter() - t0
    res.n_elements = int(mesh.n_elements)

    # first-call compile (counted separately, like the reference's setup
    # timers vs the per-step wall clock)
    t0 = time.perf_counter()
    ih0 = float(mesh.energy(state.x))
    if step_chunk > 1 and hasattr(integ, "multi_step"):
        _ = integ.multi_step(state, step_chunk)
    else:
        _ = integ.step(state)
    jax.block_until_ready(_[0].x if hasattr(_[0], "x") else _[0])
    res.compile_time = time.perf_counter() - t0

    # trace starts with the initial energy row (main.cpp:176-178)
    res.ih_trace = [ih0]
    res.t_trace = [0.0]
    ih_prev = ih_prev0
    t_loop = time.perf_counter()
    step_i = start_step
    ckpt_dir = os.path.join(out_dir, "checkpoints") if out_dir else None
    while step_i < cfg.n_steps:
        if step_chunk > 1 and hasattr(integ, "multi_step"):
            state, infos = integ.multi_step(state, step_chunk)
            ihs = [float(v) for v in np.asarray(infos.ih_start)]
        else:
            state, info = integ.step(state)
            ihs = [
                float(info.ih_start) if hasattr(info, "ih_start") else float(info)
            ]
        now = time.perf_counter() - t_loop
        # failure watchdog (the reference's failure handling is
        # assert/exit(1), SURVEY §5.3; here: stop, keep artifacts)
        if not all(np.isfinite(ihs)):
            res.failed = True
            print(
                f"[{cfg.name}] non-finite energy at step ~{step_i}; stopping",
                flush=True,
            )
            res.ih_trace.extend(ihs)
            res.t_trace.extend([now] * len(ihs))
            step_i += len(ihs)
            break
        done = False
        for ih in ihs:
            step_i += 1
            res.ih_trace.append(ih)
            res.t_trace.append(now)
            # |dIh/dt| < DtTol stop (main.cpp:200-208)
            if step_i > 1 and abs((ih - ih_prev) / cfg.dt) < cfg.dt_tol:
                done = True
            ih_prev = ih
            if done:
                break
        if verbose:
            print(f"step {step_i}: Ih={ihs[-1]:.8g}", flush=True)
        if checkpoint_every and ckpt_dir and step_i % checkpoint_every == 0:
            from .checkpoint import save_checkpoint

            save_checkpoint(ckpt_dir, cfg, mesh, state, step_i, ih_prev)
        if done:
            res.converged = True
            break
    res.loop_time = time.perf_counter() - t_loop
    res.n_steps = step_i
    res.final_ih = res.ih_trace[-1]

    if out_dir is not None:
        os.makedirs(out_dir, exist_ok=True)
        x_final = np.asarray(state.x, dtype=np.float64)
        mesh_io.write_points(os.path.join(out_dir, "points.txt"), x_final)
        mesh_io.write_triangles(
            os.path.join(out_dir, "triangles.txt"), np.asarray(mesh._F_np)
        )
        mesh_io.write_mask(
            os.path.join(out_dir, "mask.txt"), np.asarray(mesh.mask_np)
        )
        mesh_io.write_energy_trace(
            os.path.join(out_dir, f"Ih{cfg.method}.txt"),
            res.t_trace,
            res.ih_trace,
        )
        with open(os.path.join(out_dir, "summary.json"), "w") as f:
            json.dump(res.summary(), f, indent=2)
    return res
