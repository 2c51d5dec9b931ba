"""Interactive experiment REPL — ``python -m mmadmm_tpu.harness``.

The reference's ``experiments.py`` is an interactive dispatcher: it prints
a function menu and ``eval``s the typed name in a loop
(``experiments.py:682-692``). Same workflow here, dispatching to the
library sweep functions instead of subprocess + mesh.exe.
"""

from __future__ import annotations

import os

from ..config import load_experiment_config
from . import experiments as exps
from .runner import run_experiment

REF_INPUTS = "/root/reference/Experiments/InputFiles"

FUNS = """
run_one()                  -- run a single config (any method)
run_method_comparison()    -- methods 0/1/2 on one config (Single*.json)
run_device_scaling()       -- device-mesh sweep (Para*.json analogue)
run_grid_scale()           -- grid-size sweep over <name><n>.json configs
run_simultaneous_experiment() -- matched size/shard sweep (Simul*.json)
compare_to_reference()     -- parity report vs a shipped Ih<m>.txt trace
create_input()             -- write a reference-schema config JSON
exit()
"""


def _cfg_path(name: str) -> str:
    if os.path.exists(name):
        return name
    return os.path.join(REF_INPUTS, f"{name}.json")


def run_one():
    name = input("config name = ")
    method = int(input("method (0 1 2) = ") or "0")
    cfg = load_experiment_config(_cfg_path(name), method=method)
    res = run_experiment(cfg, out_dir=f"Results/{cfg.name}", verbose=True)
    print(f"final Ih={res.final_ih:.8g} steps={res.n_steps} "
          f"loop_time={res.loop_time:.2f}s")


def run_method_comparison():
    name = input("config name = ")
    out = exps.run_method_comparison(
        _cfg_path(name), out_dir=f"Results/{name}"
    )
    for m, r in out["methods"].items():
        print(f"method {m}: {r['mean_time']:.2f}s final_ih={r['final_ih']:.8g}")


def run_device_scaling():
    name = input("config name = ")
    counts = input("device counts (default 1 2 4 8) = ") or "1 2 4 8"
    out = exps.run_device_scaling(
        _cfg_path(name), device_counts=[int(c) for c in counts.split()],
        out_dir=f"Results/{name}",
    )
    for nd, r in out["devices"].items():
        print(f"{nd} devices: {r['mean_time']:.2f}s "
              f"({r['steps_per_s']:.2f} steps/s)")


def run_grid_scale():
    name = input("test name (config prefix) = ")
    input_dir = input(f"input dir (default {REF_INPUTS}) = ") or REF_INPUTS
    exps.run_grid_scale(input_dir, name, out_dir=f"Results/{name}")


def run_simultaneous_experiment():
    name = input("test name (config prefix) = ")
    input_dir = input(f"input dir (default {REF_INPUTS}) = ") or REF_INPUTS
    out = exps.run_simultaneous_experiment(
        input_dir, name, out_dir=f"Results/{name}"
    )
    for cfg, rec in out["configs"].items():
        for key, times in rec.items():
            print(f"{cfg} {key}: mean {sum(times)/len(times):.2f}s")


def compare_to_reference():
    name = input("config name = ")
    method = int(input("method (0 1 2) = ") or "0")
    cfg = load_experiment_config(_cfg_path(name), method=method)
    res = run_experiment(cfg)
    print(exps.compare_to_reference(res, name, method))


def create_input():
    out = input("output path = ")
    dim = int(input("Dim (2 3) = ") or "2")
    keys = ["test_type", "mon_type", "n_steps", "dt", "tau", "rho", "nx"]
    kw: dict = {"dim": dim}
    for k in keys:
        v = input(f"{k} = ")
        if v:
            kw[k] = type(getattr(exps.make_config_json, "__kwdefaults__")[k])(v)
    print("wrote", exps.make_config_json(out, **kw))


def main():
    menu = {
        "run_one()": run_one,
        "run_method_comparison()": run_method_comparison,
        "run_device_scaling()": run_device_scaling,
        "run_grid_scale()": run_grid_scale,
        "run_simultaneous_experiment()": run_simultaneous_experiment,
        "compare_to_reference()": compare_to_reference,
        "create_input()": create_input,
    }
    while True:
        print(FUNS)
        choice = input("experiments> ").strip()
        if choice in ("exit()", "exit", "quit", ""):
            return
        fn = menu.get(choice if choice.endswith(")") else choice + "()")
        if fn is None:
            print(f"unknown function {choice!r}")
            continue
        try:
            fn()
        except KeyboardInterrupt:
            print("\n(interrupted)")
        except Exception as e:  # keep the REPL alive like the reference
            print(f"error: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
