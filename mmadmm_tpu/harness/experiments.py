"""Experiment sweep workflows.

Re-provides the reference's ``experiments.py`` entry points
(``run_scale_experiment`` ``:503-541``, ``run_parallel_experiment``
``:435-468``, ``plot_energy_decrease`` ``:209-283``) as library functions:

* ``run_method_comparison`` — run methods 0/1/2 on one config, record wall
  times + traces (the reference's ``Single<cfg>.json`` artifact),
* ``run_device_scaling`` — sweep element-shard counts (the reference swept
  OpenMP threads 1..32), record times (``Para<cfg>.json`` analogue),
* ``compare_to_reference`` — load a shipped ``Ih<m>.txt`` trace and report
  step-wise deltas for parity checking.
"""

from __future__ import annotations

import json
import os

import numpy as np

from ..config import ExperimentConfig, load_experiment_config
from .runner import run_experiment

REF_RESULTS = "/root/reference/Experiments/Results"


def run_method_comparison(
    cfg_path: str,
    out_dir: str | None = None,
    methods=(0, 1, 2),
    n_repeats: int = 1,
    **run_kw,
) -> dict:
    """Single-config method timing comparison (experiments.py:503-541)."""
    results: dict = {"config": cfg_path, "methods": {}}
    for m in methods:
        times, finals, steps = [], [], []
        for _ in range(n_repeats):
            cfg = load_experiment_config(cfg_path, method=m)
            res = run_experiment(
                cfg,
                out_dir=os.path.join(out_dir, f"method{m}") if out_dir else None,
                **run_kw,
            )
            times.append(res.loop_time)
            finals.append(res.final_ih)
            steps.append(res.n_steps)
        results["methods"][str(m)] = {
            "mean_time": float(np.mean(times)),
            "times": times,
            "final_ih": finals[-1],
            "n_steps": steps[-1],
            "n_elements": res.n_elements,
        }
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "Single.json"), "w") as f:
            json.dump(results, f, indent=2)
    return results


def run_device_scaling(
    cfg_path: str,
    device_counts=(1, 2, 4, 8),
    out_dir: str | None = None,
    n_repeats: int = 1,
    **run_kw,
) -> dict:
    """Element-shard scaling sweep — the reference's OpenMP thread sweep
    (experiments.py:435-468) mapped to device-mesh sizes."""
    results: dict = {"config": cfg_path, "devices": {}}
    for nd in device_counts:
        times = []
        for _ in range(n_repeats):
            cfg = load_experiment_config(cfg_path)
            cfg.n_devices = nd
            res = run_experiment(cfg, out_dir=None, **run_kw)
            times.append(res.loop_time)
        results["devices"][str(nd)] = {
            "mean_time": float(np.mean(times)),
            "times": times,
            "steps_per_s": res.n_steps / float(np.mean(times)),
        }
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "Para.json"), "w") as f:
            json.dump(results, f, indent=2)
    return results


def make_config_json(
    out_path: str,
    *,
    dim: int = 2,
    test_type: str = "SquareGrid",
    mon_type: int = 0,
    comp_mesh: bool = False,
    boundary_type: int = 1,
    grad_use: bool = False,
    n_steps: int = 1000,
    admm_iter: int = 200,
    dt_tol: float = 1e-5,
    dt: float = 5e-3,
    tau: float = 0.1,
    rho: float = 50.0,
    w: float = 0.0,
    nx: int = 20,
    ny: int | None = None,
    nz: int | None = None,
    bounds=(0.0, 1.0, 0.0, 1.0, 0.0, 1.0),
    extra: dict | None = None,
) -> str:
    """Write a reference-schema experiment JSON (the analogue of the
    reference's string templates + ``create_input_from_dict``,
    ``experiments.py:36-88``). Returns ``out_path``."""
    xa, xb, ya, yb, za, zb = bounds
    data: dict = {
        "TestType": test_type,
        "Dim": dim,
        "MonType": mon_type,
        "Method": 0,
        "CompMesh": comp_mesh,
        "BoundaryType": boundary_type,
        "GradUse": grad_use,
        "nSteps": n_steps,
        "AdmmIter": admm_iter,
        "DtTol": dt_tol,
        "dt": dt,
        "tau": tau,
        "rho": rho,
        "w": w,
        "nx": nx,
        "ny": nx if ny is None else ny,
        "xa": xa,
        "xb": xb,
        "ya": ya,
        "yb": yb,
    }
    if dim == 3:
        data.update({"nz": nx if nz is None else nz, "za": za, "zb": zb})
    if extra:
        data.update(extra)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(data, f, indent=4)
    return out_path


def run_grid_scale(
    input_dir: str,
    test_name: str,
    out_dir: str | None = None,
    methods=(0, 1, 2),
    **run_kw,
) -> dict:
    """Grid-size scale sweep: run every ``<test_name><n>.json`` under
    ``input_dir`` (sorted by n) for each method, recording wall times — the
    reference's ``run_scale_experiment`` (``experiments.py:503-541``, which
    globs InputFiles and dumps ``Data/<name>/Single<cfg>.json``)."""
    import glob as _glob
    import re as _re

    paths = []
    for p in _glob.glob(os.path.join(input_dir, f"{test_name}*.json")):
        m = _re.match(
            rf"{_re.escape(test_name)}(\d+)\.json$", os.path.basename(p)
        )
        if m:
            paths.append((int(m.group(1)), p))
    results: dict = {"test_name": test_name, "configs": {}}
    for n, p in sorted(paths):
        comp = run_method_comparison(
            p,
            out_dir=os.path.join(out_dir, f"{test_name}{n}") if out_dir else None,
            methods=methods,
            **run_kw,
        )
        results["configs"][str(n)] = comp["methods"]
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, f"Scale{test_name}.json"), "w") as f:
            json.dump(results, f, indent=2)
    return results


def run_simultaneous_experiment(
    input_dir: str,
    test_name: str,
    out_dir: str | None = None,
    n_repeats: int = 3,
    highest_pow: int = 5,
    **run_kw,
) -> dict:
    """Matched size/parallelism sweep (``run_simultaneous_experiment``,
    ``experiments.py:470-501``): the i-th config ``<test_name><n>.json``
    (sorted by n) runs ADMM with 2^i shards, ``n_repeats`` times — the
    reference paired growing grids with growing OpenMP thread counts (a
    weak-scaling-style timing). Dumps one ``Simul<cfg>.json`` per config
    with the reference's ``{"(i, pow)": [times...]}`` shape."""
    import glob as _glob
    import re as _re

    paths = []
    for p in _glob.glob(os.path.join(input_dir, f"{test_name}*.json")):
        m = _re.match(
            rf"{_re.escape(test_name)}(\d+)\.json$", os.path.basename(p)
        )
        if m:
            paths.append((int(m.group(1)), p))
    pows = [2**i for i in range(highest_pow + 1)]
    results: dict = {"test_name": test_name, "configs": {}}
    for i, (n, p) in enumerate(sorted(paths)):
        nd = pows[min(i, highest_pow)]
        times = []
        for _ in range(n_repeats):
            cfg = load_experiment_config(p)
            cfg.n_devices = nd
            res = run_experiment(cfg, out_dir=None, **run_kw)
            times.append(res.loop_time)
        key = f"({i}, {nd})"
        results["configs"][f"{test_name}{n}"] = {key: times}
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            with open(
                os.path.join(out_dir, f"Simul{test_name}{n}.json"), "w"
            ) as f:
                json.dump({key: times}, f)
    return results


def load_reference_trace(name: str, method: int = 0) -> np.ndarray:
    """Rows of (wall_s, Ih) from the shipped baseline artifacts."""
    path = os.path.join(REF_RESULTS, name, f"Ih{method}.txt")
    return np.loadtxt(path, delimiter=",", ndmin=2)


def compare_to_reference(res, name: str, method: int = 0) -> dict:
    """Step-wise parity report of a RunResult vs a recorded baseline."""
    ref = load_reference_trace(name, method)[:, 1]
    ours = np.asarray(res.ih_trace)
    n = min(len(ref), len(ours))
    delta = np.abs(ours[:n] - ref[:n])
    rel = delta / np.maximum(np.abs(ref[:n]), 1e-30)
    return {
        "n_compared": int(n),
        "max_rel_delta": float(rel.max()),
        "first_divergence_step": int(np.argmax(rel > 1e-4)) if (rel > 1e-4).any() else -1,
        "final_ours": float(ours[-1]),
        "final_ref": float(ref[-1]),
    }
