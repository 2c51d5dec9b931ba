"""Headline benchmark: MM-ADMM time-to-convergence on the largest 2D
baseline config (Monitor1320, 204,800 triangles, 409,600 after cell split).

Reference baseline: the recorded trace `Results/Monitor1320/Ih0.txt` —
~108 ADMM time steps to the DtTol stop in 52.97 s single-thread C++
(`BASELINE.md`). We run the same config with the same DtTol stop on this
chip (f32 fast path, component-form Pallas prox kernels, whole-run
device loops for small configs / chunked dispatches for large ones) and
report wall seconds; `vs_baseline` = reference_time / our_time (higher
is better). Round-4 rehearsals: 9.7-9.9 s to reference quality = 5.3-5.4x.

Robustness (round-1 postmortem: the driver's capture timed out mid
cold-compile):
  * the persistent compile cache under .jax_cache/ is committed to the
    repo. Measured caveat (round 3): the CLIENT cache round-trips
    correctly (83 KB probe: 0.71 s first process, 0.02 s second), but
    this backend's remote compile server re-loads/compiles big programs
    SERVER-side on first execution after its own cache cools — ~300 s
    for the headline program even on a client hit. The budget math
    absorbs it (300 s load + ~45 s run << 2400 s);
  * progress goes to stderr so a timeout still leaves diagnostics;
  * MMADMM_BENCH_BUDGET (seconds, default 2400) tiers the run down to
    Monitor1160 when the elapsed time after compile+warmup leaves no
    room for the full 1320 run.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

# time-to-converge, 1-thread C++ (Results/<cfg>/Ih0.txt last row;
# cross-checked vs Data/<grp>/Single<cfg>.json — see BASELINE.md).
# 3DMonitor1{10,20} ran their full 100 steps without a DtTol stop, so the
# last-row wall time IS the 100-step time; 3DMonitor140 ships no trace,
# its number is Data/3DMonitor1/Single3DMonitor140.json (full run, ADMM).
REF_SECONDS = {
    "Monitor120": 3.82,
    "Monitor140": 0.398,
    "Monitor180": 1.14,
    "Monitor220": 0.133,
    "Monitor320": 0.145,
    "Monitor1320": 52.97,
    "Monitor1160": 12.73,  # Results/Monitor1160/Ih0.txt last row
    "Monitor2320": 169.1,
    "Monitor2160": 21.0,
    "Monitor3320": 96.5,  # UNRUNNABLE from the shipped reference: its
    # CircleEx192 points/triangles files are missing from the repo (only
    # the mask survived) — the reference binary cannot run this config
    # today either. "Monitor3320r" is the reproducible stand-in: the same
    # config on a 1:4 midpoint refinement of the shipped CircleEx96 mesh
    # (265,004 triangles, within 0.5% of the lost mesh's node count) —
    # see mmadmm_tpu/geometry/refine.py.
    "Monitor3320r": 96.5,
    "Monitor3160": 7.21,
    # mid-tier recorded artifacts (VERDICT r4 "finish the recorded-artifact
    # sweep"): Results/<cfg>/Ih0.txt last-row wall seconds
    "Monitor210": 0.0292637,
    "Monitor240": 1.29805,
    "Monitor280": 2.63541,
    "Monitor310": 0.193959,
    "Monitor340": 0.376279,
    "Monitor380": 2.78409,
    "3DMonitor110": 4.25,
    "3DMonitor120": 33.34,
    "3DMonitor140": 397.6,
    "3DMonitor210": 7.54,
    "3DMonitor220": 42.38,
    "3DMonitor240": 350.9,  # Data/3DMonitor2/Single3DMonitor240.json
    # CompMesh family (xi-mesh Ehat): trace Results/3DMonitor310/Ih0.txt;
    # 320 ships no trace (Data/3DMonitor3/Single3DMonitor320.json)
    "3DMonitor310": 4.04989,
    "3DMonitor320": 32.392,
    # the 6.1M-tet tier (nx=80), single-thread reference times from
    # Data/3DMonitor{1,2}/Single3DMonitor{1,2}80.json (no recorded traces)
    "3DMonitor180": 25290.0,
    "3DMonitor280": 2865.0,
}
# the functional value the reference's DtTol stop landed on (same
# Ih0.txt last row). Our Newton-based prox keeps finding genuine descent
# long after the reference's warm-started BFGS stalls (we converge BELOW
# these values), so the apples-to-apples headline is time-to-REFERENCE-
# quality: wall seconds until Ih first reaches the reference's converged
# value. The run still continues to the same |dIh/dt| < DtTol stop the
# reference uses, and both times are reported.
REF_FINAL_IH = {
    # the reference's recorded Monitor120 trace is the unguarded
    # 1000-step run (final 0.828926); our guarded run converges BELOW it
    # in ~50 steps, so first touch of 0.828926 is the honest target
    "Monitor120": 0.828926,
    "Monitor140": 0.813178,
    "Monitor180": 0.813195,
    "Monitor220": 2.59474,
    "Monitor320": 0.118747,
    "Monitor1320": 0.81342,
    "Monitor1160": 0.81342,
    "Monitor2320": 2.60916,
    "Monitor2160": 2.60876,
    "Monitor3320": 0.154967,
    "Monitor3160": 0.132482,
    "Monitor210": 2.58595,   # Results/Monitor210/Ih0.txt last row
    "Monitor240": 2.60718,
    "Monitor280": 2.6075,
    "Monitor310": 0.118747,
    "Monitor340": 0.1238,
    "Monitor380": 0.125944,
    "3DMonitor110": 1.544,    # Results/3DMonitor110/Ih0.txt last row
    "3DMonitor120": 1.54497,  # Results/3DMonitor120/Ih0.txt last row
    # 3DMonitor140: no recorded trace — time_to_converge metric instead
    "3DMonitor210": 10.0217,  # Results/3DMonitor210/Ih0.txt last row
    "3DMonitor220": 10.0692,  # Results/3DMonitor220/Ih0.txt last row
    # 3DMonitor240: no recorded trace
    "3DMonitor310": 0.868609,  # Results/3DMonitor310/Ih0.txt last row
}
T0 = time.perf_counter()


def log(msg: str) -> None:
    print(f"[bench +{time.perf_counter() - T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def pallas_smoke() -> bool:
    """Minimal COMPILED (non-interpret) calls of both prox kernels on tiny
    meshes — a Mosaic-compilation regression fails here in seconds with a
    real traceback, instead of minutes into the full-program compile (the
    CPU suite only covers the kernels in interpret mode; VERDICT r4 weak
    item 3). Returns False on failure so the caller can log and let the
    config build fall back to the vmap prox."""
    import jax
    import jax.numpy as jnp

    from mmadmm_tpu.config import ExperimentConfig
    from mmadmm_tpu.problems import build_problem

    try:
        for dim, nx in ((2, 8), (3, 4)):
            cfg = ExperimentConfig(
                test_type="SquareGrid", dim=dim, mon_type=1, method=0,
                nx=nx, ny=nx, nz=nx, dt=5e-3, tau=0.1, rho=50.0,
                dtype="float32", prox_backend="pallas",
            )
            mesh, _integ = build_problem(cfg)
            z = mesh.gather(mesh.X0)
            t0 = time.perf_counter()
            z2, ih0 = mesh.prox_fn(
                mesh.grid, z, mesh.xi, z, mesh.elem_free, 1e-5, 3
            )[:2]
            jax.block_until_ready(z2)
            ok = bool(jnp.isfinite(ih0).all()) and bool(
                jnp.isfinite(z2).all()
            )
            if not ok:
                log(f"pallas smoke {dim}D: NON-FINITE output")
                return False
            log(
                f"pallas smoke {dim}D: compiled+ran in "
                f"{time.perf_counter() - t0:.1f}s "
                f"(ih0 sum={float(jnp.sum(ih0)):.6g})"
            )
        return True
    except Exception as e:  # noqa: BLE001 — report, don't die
        log(f"pallas smoke FAILED: {e!r}")
        return False


def _build(name: str):
    from mmadmm_tpu.config import load_experiment_config
    from mmadmm_tpu.problems import build_problem

    cfg_path = f"/root/reference/Experiments/InputFiles/{name}.json"
    if not os.path.exists(cfg_path) and name == "Monitor3320r":
        from mmadmm_tpu.geometry.refine import make_circle_ex192r

        cfg_path = make_circle_ex192r(os.path.dirname(
            os.path.abspath(__file__)
        ))
    cfg = load_experiment_config(cfg_path)
    cfg.dtype = "float32"  # TPU fast path; reductions stay f64-accurate
    # component-form Pallas prox kernels (measured on-chip: 2D 12.5 ms
    # vs 56.6 ms vmap at Monitor1320, 3D 10.1 ms vs 51.2 ms at
    # 3DMonitor220; headline 16.7 -> 9.9 s). MMADMM_PROX=vmap overrides;
    # ineligible configs (2D comp-mesh, asymmetric monitors) fall back
    # via the ValueError below. Round 5: CompMesh 3D also runs the
    # kernel — in CHORD mode (VMEM-cached Hessian, refresh only on
    # rejection), which removes the round-4 pathology where exact-Newton
    # sweeps lost to the vmap chord on the weakly-regularized
    # 3DMonitor320 (61 s vs 9.3 s).
    if os.environ.get("MMADMM_PROX") is None:
        cfg.prox_backend = "pallas"
    log(f"{name}: building problem (prox={cfg.prox_backend})")
    try:
        mesh, integ = build_problem(cfg)
    except ValueError:
        cfg.prox_backend = "auto"
        mesh, integ = build_problem(cfg)
    return cfg, mesh, integ


def run_config_device(name: str):
    """Whole-run device loop (one dispatch per phase): A. DtTol run —
    honest wall to the reference's own stop; B. rerun with the in-graph
    target stop at the LAST downward crossing of the reference's final Ih
    (found from A's trace) — honest wall to reference quality. Returns
    (wall, steps, ih, t_target)."""
    import jax
    import numpy as np

    cfg, mesh, integ = _build(name)
    cap = cfg.n_steps
    log(f"{name}: NF={mesh.n_elements}, compiling device-loop (cap={cap})")
    tc = time.perf_counter()
    s, _, _ = integ.run_device(integ.init_state(), cap=cap,
                               dt_tol=cfg.dt_tol)
    jax.block_until_ready(s.x)
    log(f"{name}: compile+first run done in {time.perf_counter() - tc:.1f}s")

    t0 = time.perf_counter()
    s, trace, steps = integ.run_device(integ.init_state(), cap=cap,
                                       dt_tol=cfg.dt_tol)
    jax.block_until_ready(s.x)
    wall = time.perf_counter() - t0
    steps = int(steps)
    tr = np.asarray(trace)
    ih = float(tr[steps - 1])
    log(f"{name}: DtTol stop at {wall:.2f}s / {steps} steps, Ih={ih:.6f}")

    target = REF_FINAL_IH.get(name)
    t_target = None
    if target is not None:
        above = np.nonzero(~(tr[:steps] <= target))[0]  # NaN -> above
        k = (int(above[-1]) + 1) if above.size else 0
        if k < steps:  # quality reached and held to the stop
            t0 = time.perf_counter()
            s2, _, st2 = integ.run_device(
                integ.init_state(), cap=cap, dt_tol=cfg.dt_tol,
                target_ih=target, min_steps=k + 1,
            )
            jax.block_until_ready(s2.x)
            t_target = time.perf_counter() - t0
            log(f"{name}: target stop at step {int(st2)}, {t_target:.2f}s")
        else:
            # quality EXTENSION (ADVICE r4 medium): the run ended above
            # the reference's recorded final Ih — either the step cap
            # bound it (3DMonitor120 runs its full nSteps) or the DtTol
            # stop fired early (Monitor220). Rerun with 4x the cap and
            # the DtTol stop disabled; if the trajectory does reach the
            # reference's quality, time THAT honestly (wall to the
            # in-graph target stop, extra steps included). If it never
            # reaches, the row stays annotated below-quality.
            cap4 = 4 * cap
            log(f"{name}: quality not reached in cap={cap}; extending "
                f"to cap={cap4} with DtTol off")
            s3, tr3, st3 = integ.run_device(
                integ.init_state(), cap=cap4, dt_tol=0.0,
            )
            jax.block_until_ready(s3.x)
            tr3 = np.asarray(tr3)
            st3 = int(st3)
            above3 = np.nonzero(~(tr3[:st3] <= target))[0]
            k3 = (int(above3[-1]) + 1) if above3.size else 0
            if k3 < st3:
                t0 = time.perf_counter()
                s4, _, st4 = integ.run_device(
                    integ.init_state(), cap=cap4, dt_tol=0.0,
                    target_ih=target, min_steps=k3 + 1,
                )
                jax.block_until_ready(s4.x)
                t_target = time.perf_counter() - t0
                log(f"{name}: EXTENDED target stop at step {int(st4)}, "
                    f"{t_target:.2f}s")
            else:
                log(f"{name}: quality unreachable even at cap={cap4} "
                    f"(floor {np.nanmin(tr3[:st3]):.6f} > {target})")
    return wall, steps, ih, t_target


def run_config(name: str, chunk: int | None = None):
    """Compile + run one config to the DtTol stop; returns (wall, steps, ih).
    Round-3 host-chunked loop — kept as the fallback path."""
    import jax

    cfg, mesh, integ = _build(name)
    if chunk is None and os.environ.get("MMADMM_BENCH_CHUNK"):
        chunk = int(os.environ["MMADMM_BENCH_CHUNK"])
    if chunk is None:
        # chunk=8 everywhere: bigger chunks amortize the tunnel dispatch
        # latency but coarsen the time-to-quality measurement to chunk
        # boundaries — measured net-worse for the recorded metric (3D110:
        # 1.89 s @8 vs 2.59 s @26). The 6.1M-tet tier also measured
        # BETTER at chunk 8 (280: 3.60 -> 3.26 s/step — the host loop
        # adds ~0.5 s/chunk beyond compute) and its 8-step dispatches
        # (10-26 s) stay under the tunnel's ~47 s kill threshold.
        chunk = 8
    # land exactly on the config's nSteps cap: the loop below runs whole
    # chunks, so a non-divisor chunk overshoots (a 100-step tier ran 104
    # steps at chunk 8 — 4 uncounted-by-the-reference steps of pure wall)
    if cfg.n_steps % chunk:
        chunk = next(c for c in (10, 5, 4, 2, 1) if cfg.n_steps % c == 0)
    log(f"{name}: NF={mesh.n_elements}, compiling chunk={chunk} step program")

    state = integ.init_state()
    # compile the chunked-step program before timing (the reference's timer
    # also excludes its build; main.cpp:176 starts after setup). Only
    # multi_step is used in the timed loop — compiling integ.step too would
    # double the (multi-minute, remote) TPU compile for nothing.
    tc = time.perf_counter()
    _s, _ = integ.multi_step(state, chunk)
    jax.block_until_ready(_s.x)
    log(f"{name}: compile+warm chunk done in {time.perf_counter() - tc:.1f}s")

    target = REF_FINAL_IH.get(name)
    state = integ.init_state()
    t0 = time.perf_counter()
    ih_prev = None
    steps = 0
    done = False
    # wall seconds of the LAST downward crossing of the ref's final Ih:
    # Ih is not monotone (the predictor guard exists because Ihstart can
    # rise), so a transient dip must not count as "reached quality" —
    # reset on any step back above target
    t_target = None
    while steps < cfg.n_steps and not done:
        state, infos = integ.multi_step(state, chunk)
        ihs = [float(v) for v in infos.ih_start]
        now = time.perf_counter() - t0  # chunk boundary (conservative)
        for ih in ihs:
            steps += 1
            if target is not None:
                if ih <= target:
                    if t_target is None:
                        t_target = now
                else:
                    t_target = None
            if ih_prev is not None and abs((ih - ih_prev) / cfg.dt) < cfg.dt_tol:
                done = True
                break
            ih_prev = ih
        log(f"{name}: step {steps}, Ih={ih_prev:.6f}")
    jax.block_until_ready(state.x)
    return time.perf_counter() - t0, steps, ih_prev, t_target


def main() -> None:
    name = sys.argv[1] if len(sys.argv) > 1 else "Monitor1320"
    budget = float(os.environ.get("MMADMM_BENCH_BUDGET", "2400"))

    from mmadmm_tpu.runtime.cache import enable_persistent_cache

    cache_dir = enable_persistent_cache()
    log(f"cache dir {cache_dir} "
        f"({len(os.listdir(cache_dir)) if os.path.isdir(cache_dir) else 0} entries)")

    import jax  # noqa: F401  (device init before timing anything)

    # on-chip Mosaic smoke: compile + run both kernels tiny, FIRST — a
    # kernel regression is diagnosed here in seconds; on failure force the
    # vmap prox so the bench still produces a number
    if os.environ.get("MMADMM_PROX") is None and not pallas_smoke():
        log("forcing MMADMM_PROX=vmap after smoke failure")
        os.environ["MMADMM_PROX"] = "vmap"

    # Whole-run device loop only for configs whose run fits in ONE short
    # dispatch: this tunnel kills device dispatches that run for minutes
    # (measured: a 47 s dispatch survived, heavier ones reproducibly die
    # with "TPU device error" — the BE fault post-mortem,
    # integrators/backward_euler.py docstring). Large configs keep the
    # chunked host loop (~1 s dispatches) — EXCEPT the 2D production
    # sizes, whose stencil-engine step is fast enough that the whole
    # DtTol run is one short dispatch (Monitor1320: 280 steps in 5.45 s
    # measured on-chip — the chunked loop's per-chunk dispatch overhead
    # was costing the headline 2.2x). The 6.1M-tet SoA tiers stay
    # chunked: their 0.2-3.6 s/step puts a whole run far past the kill
    # line.
    small = REF_SECONDS.get(name, 1e9) <= 35.0
    # measured dispatch lengths: Monitor1320 5.45 s, Monitor2320 5.58 s,
    # 3DMonitor220 ~5 s, Monitor3320r ~11 s, 3DMonitor140 ~22 s,
    # 3DMonitor240 ~25 s — all under the 47 s survival record
    device_safe = name in (
        "Monitor1320", "Monitor2320", "3DMonitor220", "Monitor3320r",
        "3DMonitor140", "3DMonitor240",
    )
    loop_mode = os.environ.get(
        "MMADMM_BENCH_LOOP",
        "device" if (small or device_safe) else "chunked",
    )
    tiered_down = False
    try:
        if loop_mode == "device":
            try:
                wall, steps, ih, t_target = run_config_device(name)
            except Exception as e:  # fall back to the chunked host loop
                log(f"{name} device-loop failed ({e!r}); chunked fallback")
                loop_mode = "chunked-fallback"
                wall, steps, ih, t_target = run_config(name)
        else:
            wall, steps, ih, t_target = run_config(name)
    except Exception as e:  # tier down rather than die with no number
        log(f"{name} failed ({e!r}); tiering down to Monitor1160")
        name = "Monitor1160"
        tiered_down = True
        wall, steps, ih, t_target = run_config(name)

    ref = REF_SECONDS.get(name, REF_SECONDS["Monitor1320"])
    left = budget - (time.perf_counter() - T0)
    log(
        f"{name}: ref quality (Ih<={REF_FINAL_IH.get(name)}) reached at "
        f"{t_target}s; DtTol stop at {wall:.2f}s / {steps} steps "
        f"(budget left {left:.0f}s)"
    )
    # machine-readable record of every measured config (the one-line
    # driver contract below only carries the invoked config; this file is
    # the cross-round perf table)
    try:
        rec_path = os.path.join(os.path.dirname(__file__) or ".",
                                "Results", "tpu_bench.json")
        os.makedirs(os.path.dirname(rec_path), exist_ok=True)
        records = {}
        if os.path.exists(rec_path):
            with open(rec_path) as f:
                records = json.load(f)
        records[name] = {
            "t_to_ref_quality_s": None if t_target is None else round(t_target, 3),
            "t_dttol_stop_s": round(wall, 3),
            "steps": steps,
            "final_ih": ih,
            "ref_seconds": ref,
            "ref_final_ih": REF_FINAL_IH.get(name),
            "vs_baseline": round(ref / (t_target if t_target else wall), 3),
            "mode": loop_mode,
            "measured_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        with open(rec_path, "w") as f:
            json.dump(records, f, indent=1, sort_keys=True)
    except Exception as e:  # noqa: BLE001 — never fail the driver line
        log(f"(tpu_bench.json update failed: {e!r})")
    if t_target is not None:
        # headline: time to the reference's converged functional value
        # (we then keep descending to a LOWER Ih before the same DtTol
        # stop fires — both times reported)
        line = {
            "metric": f"{name.lower()}_time_to_ref_quality",
            "value": round(t_target, 2),
            "unit": (
                f"s (ref {ref}s; our DtTol stop {wall:.1f}s/"
                f"{steps} steps at lower Ih={ih:.6g})"
            ),
            "vs_baseline": round(ref / t_target, 3),
        }
        if tiered_down:
            line["tiered_down"] = True
        print(json.dumps(line))
    else:  # never reached the reference's value — report the honest stop
        line = {
            "metric": f"{name.lower()}_time_to_converge",
            "value": round(wall, 2),
            "unit": f"s ({steps} steps, final_ih={ih:.6g})",
            "vs_baseline": round(ref / wall, 3),
        }
        if tiered_down:
            line["tiered_down"] = True
        print(json.dumps(line))


if __name__ == "__main__":
    main()
