"""BE stencil-matvec + Richardson-terms A/B at a production config:
per-step wall over a fixed window for (grid on/off) x (terms 6/4/3).

Usage: python -u scripts/tpu_be_grid_probe.py [Monitor1160] [n_steps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

name = sys.argv[1] if len(sys.argv) > 1 else "Monitor1160"
n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 96
CHUNK = 16

t0 = time.time()


def log(m):
    print(f"[+{time.time() - t0:6.1f}s] {m}", flush=True)


from mmadmm_tpu.runtime.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import jax  # noqa: E402
import numpy as np  # noqa: E402

from mmadmm_tpu.config import load_experiment_config  # noqa: E402
from mmadmm_tpu.problems import build_problem  # noqa: E402


def run(tag, grid, terms):
    os.environ["MMADMM_BE_GRID"] = "1" if grid else "0"
    os.environ["MMADMM_BE_TERMS"] = str(terms)
    cfg = load_experiment_config(
        f"/root/reference/Experiments/InputFiles/{name}.json"
    )
    cfg.dtype = "float32"
    cfg.method = 2
    mesh, integ = build_problem(cfg)
    s = integ.init_state()
    s, _ = integ.multi_step(s, CHUNK)
    jax.block_until_ready(s.x)
    s = integ.init_state()
    t1 = time.perf_counter()
    ihs = []
    for _ in range(n_steps // CHUNK):
        s, ihv = integ.multi_step(s, CHUNK)
        ihs.extend(float(v) for v in np.asarray(ihv))
    jax.block_until_ready(s.x)
    wall = time.perf_counter() - t1
    log(
        f"{tag}: {wall:.2f}s / {n_steps} steps "
        f"({1e3 * wall / n_steps:.1f} ms/step), ih={ihs[-1]:.6f}"
    )


run("stock t6", False, 6)
run("grid  t6", True, 6)
run("grid  t4", True, 4)
run("grid  t3", True, 3)
os.environ.pop("MMADMM_BE_TERMS", None)
os.environ.pop("MMADMM_BE_GRID", None)
