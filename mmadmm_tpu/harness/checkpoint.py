"""Checkpoint / resume.

The reference has no formal mechanism — its de facto path is writing the
final mesh as ``points.txt``/``triangles.txt`` and re-ingesting via the
``FromFile`` test type (``main.cpp:814-831``, SURVEY §5.4). Here both
exist:

* ``save_checkpoint`` / ``load_checkpoint``: full integrator state
  ``(X, x_prev, u_bar, steps)`` + config as a compressed npz — resumes the
  ADMM run exactly (dual variables included, which the reference's
  points.txt restart loses),
* the reference-compatible CSV path stays available through
  ``geometry.io`` + ``TestType: FromFile``.
"""

from __future__ import annotations

import dataclasses
import json
import os

import numpy as np


def save_checkpoint(
    ckpt_dir: str, cfg, mesh, state, step: int, ih_prev: float | None = None
) -> str:
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f"step_{step:06d}.npz")
    tmp = path + ".tmp"
    arrays = {
        "x": np.asarray(state.x, dtype=np.float64),
        "F": np.asarray(mesh._F_np),
        "mask": np.asarray(mesh.mask_np),
        # outer-loop position + the DtTol comparator (main.cpp:200-208),
        # so a resumed run continues the convergence test exactly
        "step_i": np.asarray(step, dtype=np.int64),
        "ih_prev": np.asarray(
            float("inf") if ih_prev is None else ih_prev, dtype=np.float64
        ),
    }
    if hasattr(state, "steps"):
        arrays["steps"] = np.asarray(state.steps)
    if hasattr(state, "x_prev"):
        arrays["x_prev"] = np.asarray(state.x_prev, dtype=np.float64)
    if hasattr(state, "u_bar"):
        arrays["u_bar"] = np.asarray(state.u_bar, dtype=np.float64)
    # energy-guard carry (adaptive predictor fallback)
    if hasattr(state, "ih_last"):
        arrays["ih_last"] = np.asarray(state.ih_last, dtype=np.float64)
    if hasattr(state, "rose"):
        arrays["rose"] = np.asarray(state.rose)
    if hasattr(state, "rises"):
        arrays["rises"] = np.asarray(state.rises)
    # chord-Jacobian carry — saved so a resumed run is bit-equal to the
    # uninterrupted one (a missing J resumes as zeros: the prox slow
    # branch then refreshes it on first rejection, correct but not
    # bit-identical)
    if hasattr(state, "J"):
        arrays["J"] = np.asarray(state.J, dtype=np.float64)
    with open(tmp, "wb") as f:
        np.savez_compressed(
            f, config=json.dumps(dataclasses.asdict(cfg)), **arrays
        )
    os.replace(tmp, path)  # atomic publish
    return path


def latest_checkpoint(ckpt_dir: str) -> str | None:
    if not os.path.isdir(ckpt_dir):
        return None
    files = sorted(
        f for f in os.listdir(ckpt_dir)
        if f.startswith("step_") and f.endswith(".npz")
    )
    return os.path.join(ckpt_dir, files[-1]) if files else None


def load_checkpoint(path: str):
    """Returns (cfg, arrays dict). Rebuild with ``resume_experiment``."""
    from ..config import ExperimentConfig

    with np.load(path, allow_pickle=False) as z:
        cfg = ExperimentConfig(**json.loads(str(z["config"])))
        arrays = {k: z[k] for k in z.files if k != "config"}
    return cfg, arrays


def resume_experiment(path: str, base_dir: str = "."):
    """Rebuild (mesh, integrator, state) from a checkpoint file."""
    import jax.numpy as jnp

    from ..problems import build_problem

    cfg, arrays = load_checkpoint(path)
    mesh, integ = build_problem(cfg, base_dir)
    state = integ.init_state()
    dtype = mesh.dtype
    updates = {"x": jnp.asarray(arrays["x"], dtype=dtype)}
    if "x_prev" in arrays and hasattr(state, "x_prev"):
        updates["x_prev"] = jnp.asarray(arrays["x_prev"], dtype=dtype)
    if "u_bar" in arrays and hasattr(state, "u_bar"):
        u = jnp.asarray(arrays["u_bar"], dtype=dtype)
        if u.shape == state.u_bar.shape:
            updates["u_bar"] = u
    if hasattr(state, "steps") and "steps" in arrays:
        updates["steps"] = jnp.asarray(arrays["steps"])
    if hasattr(state, "ih_last") and "ih_last" in arrays:
        updates["ih_last"] = jnp.asarray(arrays["ih_last"], dtype=jnp.float64)
    if hasattr(state, "rose") and "rose" in arrays:
        updates["rose"] = jnp.asarray(arrays["rose"], dtype=bool)
    if hasattr(state, "rises") and "rises" in arrays:
        updates["rises"] = jnp.asarray(arrays["rises"], dtype=jnp.int32)
    if hasattr(state, "J"):
        j_restored = False
        if "J" in arrays:
            Jv = jnp.asarray(arrays["J"], dtype=dtype)
            if Jv.shape == state.J.shape:
                updates["J"] = Jv
                j_restored = True
        if hasattr(state, "j_fresh"):
            # J not restorable (pre-J checkpoint, single<->sharded shape
            # mismatch, backend change): force a rebuild at the next prox
            # call instead of silently iterating against a zero Jacobian.
            # A checkpoint taken before any step (steps==0) holds the
            # zeros placeholder, so it needs the rebuild too.
            steps_taken = int(arrays.get("steps", 0))
            updates["j_fresh"] = jnp.asarray(
                (not j_restored) or steps_taken == 0, dtype=bool
            )
    state = state._replace(**updates)
    return cfg, mesh, integ, state


def checkpoint_meta(path: str) -> tuple[int, float]:
    """(outer step index, Ih comparator) recorded at save time — old
    checkpoints without them resume at step 0 with an inf comparator."""
    with np.load(path, allow_pickle=False) as z:
        step_i = int(z["step_i"]) if "step_i" in z.files else 0
        ih_prev = float(z["ih_prev"]) if "ih_prev" in z.files else float("inf")
    return step_i, ih_prev
