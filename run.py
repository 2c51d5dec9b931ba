"""CLI experiment driver — the analogue of ``./mesh.exe <input> [method]
[numThreads]`` (reference ``main.cpp:784-799``).

Usage:
    python run.py <inputName|path.json> [methodType] [nDevices] [options]

``inputName`` resolves against the reference's ``Experiments/InputFiles/``
when not a path (same convention as the reference CLI). ``methodType``
0=MM-ADMM, 1=explicit Euler, 2=backward Euler (clobbers the JSON ``Method``
key, like ``main.cpp:809``). ``nDevices`` shards the element batch (the
reference's ``numThreads`` analogue).
"""

from __future__ import annotations

import argparse
import os
import sys

REF_INPUTS = "/root/reference/Experiments/InputFiles"


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("input", help="experiment name or path to JSON config")
    ap.add_argument("method", nargs="?", type=int, default=None,
                    help="0=ADMM, 1=Euler, 2=backward Euler")
    ap.add_argument("n_devices", nargs="?", type=int, default=1)
    ap.add_argument("--out", default=None, help="artifact output directory")
    ap.add_argument("--base-dir", default=None,
                    help="base dir for FromFile mesh paths (defaults to the "
                         "config's repo root when using a reference config)")
    ap.add_argument("--dtype", default=None, choices=["float32", "float64"])
    ap.add_argument("--prox", default=None, choices=["vmap", "pallas"],
                    help="prox backend (pallas = component-form TPU "
                         "kernel; eligible non-comp-mesh configs only)")
    ap.add_argument("--steps", type=int, default=None, help="override nSteps")
    ap.add_argument("--chunk", type=int, default=1,
                    help="outer steps per device program (lax.scan)")
    ap.add_argument("--checkpoint-every", type=int, default=0)
    ap.add_argument("--resume", default=None, help="checkpoint file to resume")
    ap.add_argument("-v", "--verbose", action="store_true")
    args = ap.parse_args(argv)

    from mmadmm_tpu.config import load_experiment_config
    from mmadmm_tpu.harness.runner import run_experiment
    from mmadmm_tpu.runtime.cache import enable_persistent_cache

    enable_persistent_cache()

    path = args.input
    if not os.path.exists(path):
        cand = os.path.join(REF_INPUTS, path + ".json")
        if os.path.exists(cand):
            path = cand
        else:
            print(f"config not found: {args.input}", file=sys.stderr)
            return 2
    cfg = load_experiment_config(path, method=args.method)
    cfg.n_devices = args.n_devices
    if args.dtype:
        cfg.dtype = args.dtype
    if args.prox:
        cfg.prox_backend = args.prox
    if args.steps is not None:
        cfg.n_steps = args.steps

    base_dir = args.base_dir
    if base_dir is None:
        # FromFile paths in the reference configs are relative to the
        # reference repo root (main.cpp:814-831)
        base_dir = (
            os.path.dirname(os.path.dirname(os.path.dirname(path)))
            if path.startswith(REF_INPUTS)
            else "."
        )
    out_dir = args.out or os.path.join("Results", cfg.name)
    res = run_experiment(
        cfg,
        out_dir=out_dir,
        base_dir=base_dir,
        step_chunk=args.chunk,
        verbose=args.verbose,
        checkpoint_every=args.checkpoint_every,
        resume_from=args.resume,
    )
    s = res.summary()
    print(
        f"{cfg.name}: method={s['method']} steps={s['n_steps']} "
        f"converged={s['converged']} final_Ih={s['final_ih']:.6g}\n"
        f"setup={s['setup_time']:.2f}s compile={s['compile_time']:.2f}s "
        f"loop={s['loop_time']:.2f}s -> artifacts in {out_dir}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
