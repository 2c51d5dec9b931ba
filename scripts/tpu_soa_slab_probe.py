"""Per-step timing of the SoA slab engine at 3DMonitor280 under
different slab sizes (MMADMM_SOA_SLAB / MMADMM_SOA_NODE_SLAB set by the
caller). Times a warm 4-step multi_step dispatch — the production
chunked-loop unit — and prints ms/step. One config per process (slab
size is baked at integrator construction)."""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from mmadmm_tpu.config import load_experiment_config
from mmadmm_tpu.problems import build_problem
from mmadmm_tpu.runtime.cache import enable_persistent_cache

enable_persistent_cache()
import jax

name = sys.argv[1] if len(sys.argv) > 1 else "3DMonitor280"
k = int(sys.argv[2]) if len(sys.argv) > 2 else 4

cfg = load_experiment_config(
    f"/root/reference/Experiments/InputFiles/{name}.json"
)
cfg.dtype = "float32"
if os.environ.get("MMADMM_PROX") is None:
    cfg.prox_backend = "pallas"
mesh, integ = build_problem(cfg)
print(
    f"{name}: NF={mesh.n_elements} engine={type(integ).__name__} "
    f"SLAB={os.environ.get('MMADMM_SOA_SLAB', 'default')} "
    f"NODE_SLAB={os.environ.get('MMADMM_SOA_NODE_SLAB', 'default')}",
    flush=True,
)

def fence(st):
    # block_until_ready is NOT a reliable fence on this backend (see
    # README roofline note) — force a host readback
    return float(st.x.ravel()[0])


state = integ.init_state()
t0 = time.perf_counter()
state, _ = integ.multi_step(state, k)
fence(state)
print(f"compile+first {k} steps: {time.perf_counter() - t0:.1f}s",
      flush=True)

t0 = time.perf_counter()
state, _ = integ.multi_step(state, k)
fence(state)
dt = time.perf_counter() - t0
print(f"warm {k} steps: {dt:.2f}s = {1e3 * dt / k:.0f} ms/step",
      flush=True)
