"""A/B on the chip: constant-grid broadcast path vs the general 16-wide
cell table for a constant monitor (Monitor1320). Times the chunked step
program (what bench.py runs). Bit-identical trajectories (verified on
CPU), so this is purely a speed comparison."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from mmadmm_tpu.config import load_experiment_config
from mmadmm_tpu.problems import build_problem
from mmadmm_tpu.runtime.cache import enable_persistent_cache
import mmadmm_tpu.ops.monitor_grid as mg

enable_persistent_cache()

name = sys.argv[1] if len(sys.argv) > 1 else "Monitor1320"


def general_table_grid(g):
    """Rebuild the grid as the round-2 style general 16-wide table."""
    vals = np.asarray(g.values, dtype=np.float64)
    v00 = vals[:-1, :-1]
    v10 = vals[:-1, 1:]
    v01 = vals[1:, :-1]
    v11 = vals[1:, 1:]
    ny, nx = v00.shape[:2]
    ax = np.asarray(g.axes[0], dtype=np.float64)
    ay = np.asarray(g.axes[1], dtype=np.float64)
    x0 = np.broadcast_to(ax[None, :-1], (ny, nx))[..., None]
    x1 = np.broadcast_to(ax[None, 1:], (ny, nx))[..., None]
    y0 = np.broadcast_to(ay[:-1, None], (ny, nx))[..., None]
    y1 = np.broadcast_to(ay[1:, None], (ny, nx))[..., None]
    sym = [0, 1, 3]
    parts = [v00[..., sym], v10[..., sym], v01[..., sym], v11[..., sym],
             x0, x1, y0, y1]
    tbl = jnp.asarray(
        np.concatenate(parts, axis=-1).reshape(ny * nx, 16),
        dtype=g.values.dtype,
    )
    return mg.MonitorGrid(
        values=g.values, axes=g.axes, cell_table=tbl, constant=False
    )


def timed(label, grid_override):
    cfg = load_experiment_config(
        f"/root/reference/Experiments/InputFiles/{name}.json"
    )
    cfg.dtype = "float32"
    mesh, integ = build_problem(cfg)
    if grid_override is not None:
        mesh.grid = grid_override(mesh.grid)
        integ.consts["grid"] = mesh.grid
        integ._multi_cache.clear()
    state = integ.init_state()
    t0 = time.perf_counter()
    state, _ = integ.multi_step(state, 8)
    jax.device_get(state.x.ravel()[:1])
    print(f"{label}: compile+warm {time.perf_counter()-t0:.1f}s", flush=True)
    state = integ.init_state()
    # run 10 chunks (80 steps) through the expensive early phase
    t0 = time.perf_counter()
    last = None
    for _ in range(10):
        state, infos = integ.multi_step(state, 8)
        last = float(infos.ih_start[-1])
    jax.device_get(state.x.ravel()[:1])
    dt = time.perf_counter() - t0
    print(f"{label}: 80 steps in {dt:.2f}s ({dt/80*1e3:.1f} ms/step), "
          f"ih@80={last:.6f}", flush=True)


timed("constant-path", None)
timed("general-16wide", general_table_grid)
