"""AOT compile probe for the 6.1M-tet tier (3DMonitor180/280).

Lowers + compiles the ADMM step program at full 3DMonitor280 size on the
TPU backend WITHOUT executing it, then prints the compiler's memory
analysis (or the captured compile error). The round-4 README records this
tier as not fitting one chip because of (8,128) tile padding on
per-element temporaries — this probe is the ground truth for which
temporaries actually blow up after the flat-layout redesign.

Usage:  python -u scripts/tpu_280_probe.py [config] [vmap|pallas]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

name = sys.argv[1] if len(sys.argv) > 1 else "3DMonitor280"
backend = sys.argv[2] if len(sys.argv) > 2 else "pallas"

t0 = time.time()


def log(msg):
    print(f"[+{time.time() - t0:7.1f}s] {msg}", flush=True)


from mmadmm_tpu.config import load_experiment_config  # noqa: E402
from mmadmm_tpu.problems import build_problem  # noqa: E402

cfg = load_experiment_config(
    f"/root/reference/Experiments/InputFiles/{name}.json"
)
cfg.dtype = "float32"
cfg.prox_backend = backend
log(f"{name}: building problem (prox={backend})")
mesh, integ = build_problem(cfg)
log(f"NF={mesh.n_elements} NP={mesh.n_pnts} "
    f"grid_cells={getattr(mesh.grid, 'cell_table', None) is not None}")

import jax  # noqa: E402

state = integ.init_state()
log(f"state built ({type(integ).__name__}); lowering step")
consts = getattr(integ, "consts", None)
if consts is None:
    consts = integ._consts
lowered = jax.jit(integ.step_fn).lower(state, consts)
log("lowered; compiling (remote compile server, minutes)")
try:
    compiled = lowered.compile()
    log("COMPILED OK")
    ma = compiled.memory_analysis()
    log(
        f"memory: temp={ma.temp_size_in_bytes / 2**30:.2f} GiB "
        f"args={ma.argument_size_in_bytes / 2**30:.2f} GiB "
        f"out={ma.output_size_in_bytes / 2**30:.2f} GiB "
        f"alias={ma.alias_size_in_bytes / 2**30:.2f} GiB"
    )
except Exception as e:  # noqa: BLE001
    log(f"COMPILE ERROR: {repr(e)[:6000]}")
