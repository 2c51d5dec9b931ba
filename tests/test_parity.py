"""Parity tests against the reference's recorded experiment artifacts.

The reference's de facto correctness oracle is its shipped energy traces
(``Experiments/Results/<cfg>/Ih0.txt``, SURVEY §4); these tests replay the
first steps of real configs and compare trace values digit-for-digit.
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from mmadmm_tpu.config import load_experiment_config  # noqa: E402
from mmadmm_tpu.problems import build_problem  # noqa: E402

REF = "/root/reference/Experiments"

pytestmark = [
    pytest.mark.parity,
    pytest.mark.skipif(
        not os.path.isdir(REF), reason="reference artifacts not available"
    ),
]


def ref_trace(name, method=0):
    path = f"{REF}/Results/{name}/Ih{method}.txt"
    rows = np.loadtxt(path, delimiter=",")
    return rows[:, 1]


def run_steps(name, n_steps, n_devices=1, method=0):
    cfg = load_experiment_config(
        f"{REF}/InputFiles/{name}.json", method=method
    )
    cfg.n_devices = n_devices
    mesh, integ = build_problem(cfg)
    state = integ.init_state()
    out = [float(mesh.energy(state.x))]
    for _ in range(n_steps):
        state, info = integ.step(state)
        out.append(
            float(info.ih_start) if hasattr(info, "ih_start") else float(info)
        )
    return out


def test_admm_monitor120_first_steps_match_reference():
    ours = run_steps("Monitor120", 5)
    ref = ref_trace("Monitor120")
    # rows: [Ih(initial), Ih(initial), step1, step2, ...] — the reference
    # logs the pre-step energy twice (main.cpp:177-184)
    np.testing.assert_allclose(ours[0], ref[0], rtol=5e-6)
    np.testing.assert_allclose(ours[1:6], ref[1:6], rtol=5e-6)


@pytest.mark.slow
def test_admm_sharded_matches_single_device():
    single = run_steps("Monitor120", 3, n_devices=1)
    sharded = run_steps("Monitor120", 3, n_devices=4)
    np.testing.assert_allclose(single, sharded, rtol=1e-12)


def test_euler_monitor120_first_steps_match_reference():
    ours = run_steps("Monitor120", 4, method=1)
    ref = ref_trace("Monitor120", method=1)
    np.testing.assert_allclose(ours[:5], ref[:5], rtol=5e-6)


def test_backward_euler_monitor120_first_steps_match_reference():
    ours = run_steps("Monitor120", 3, method=2)
    ref = ref_trace("Monitor120", method=2)
    np.testing.assert_allclose(ours[:4], ref[:4], rtol=5e-6)


@pytest.mark.slow
def test_admm_3d_first_steps_match_reference():
    ours = run_steps("3DMonitor110", 3)
    ref = ref_trace("3DMonitor110")
    np.testing.assert_allclose(ours[0], ref[0], rtol=5e-6)
    np.testing.assert_allclose(ours[1:4], ref[1:4], rtol=5e-6)


def test_admm_monitor110_graduse_first_steps_match_reference():
    # Monitor110 is the only GradUse=True config: the predictor always
    # takes the explicit-Euler gradient step (Mesh::predictX, Mesh.cpp:655)
    ours = run_steps("Monitor110", 3)
    ref = ref_trace("Monitor110")
    np.testing.assert_allclose(ours[:4], ref[:4], rtol=5e-6)


def test_admm_monitor220_first_steps_match_reference():
    ours = run_steps("Monitor220", 3)
    ref = ref_trace("Monitor220")
    np.testing.assert_allclose(ours[0], ref[0], rtol=5e-6)
    np.testing.assert_allclose(ours[1:4], ref[1:4], rtol=5e-6)


def test_admm_monitor320_fromfile_first_steps_match_reference():
    # FromFile circle mesh (TrianglesFile paths relative to the reference
    # repo root, main.cpp:814-831); slightly looser tol — the carved-circle
    # node set amplifies monitor-interpolation rounding
    ours = run_steps("Monitor320", 3)
    ref = ref_trace("Monitor320")
    np.testing.assert_allclose(ours[:4], ref[:4], rtol=5e-5)


@pytest.mark.slow
def test_euler_3d_first_steps_match_reference():
    ours = run_steps("3DMonitor110", 3, method=1)
    ref = ref_trace("3DMonitor110", method=1)
    np.testing.assert_allclose(ours[:4], ref[:4], rtol=5e-6)


@pytest.mark.slow
def test_backward_euler_3d_first_steps_match_reference():
    ours = run_steps("3DMonitor110", 2, method=2)
    ref = ref_trace("3DMonitor110", method=2)
    np.testing.assert_allclose(ours[:3], ref[:3], rtol=5e-6)


@pytest.mark.slow
def test_admm_3dmonitor210_first_steps_match_reference():
    ours = run_steps("3DMonitor210", 3)
    ref = ref_trace("3DMonitor210")
    np.testing.assert_allclose(ours[:4], ref[:4], rtol=5e-6)


@pytest.mark.slow
def test_admm_3dmonitor310_initial_energy_matches_reference():
    # trajectory deviates by design on this weakly-regularized (rho=10)
    # config — our exact-Newton prox converges to LOWER energy than the
    # reference's BFGS (COVERAGE.md, intentional deviations); the initial
    # functional still must match
    ours = run_steps("3DMonitor310", 1)
    ref = ref_trace("3DMonitor310")
    np.testing.assert_allclose(ours[0], ref[0], rtol=5e-6)


@pytest.mark.slow
@pytest.mark.parametrize(
    "name,floor",
    [
        ("Monitor1160", 0.80),   # recorded final 0.81342
        ("Monitor2160", 2.55),   # recorded final 2.60876
        ("Monitor3160", 0.12),   # recorded final 0.132482
        ("3DMonitor120", 1.50),  # recorded final 1.54497 (tet mesh)
    ],
)
def test_admm_f32_converges_at_scale(name, floor):
    """Production-scale convergence under the energy guard, f32 fast path
    (the bench configuration), one pin per monitor family + 3D: the run
    must hit the DtTol stop with a final Ih at or below the recorded
    converged value (Results/<cfg>/Ih0.txt last row) within the step
    budget. The UNGUARDED reference binary diverges on the fine 2D
    configs (README: "The energy guard"); these pins catch any f32-path
    or guard regression per family."""
    cfg = load_experiment_config(f"{REF}/InputFiles/{name}.json")
    cfg.dtype = "float32"
    mesh, integ = build_problem(cfg)
    state = integ.init_state()
    ih_prev = float("inf")
    final = None
    # the reference's own stopping rule (main.cpp:180-211): DtTol stop OR
    # the config's nSteps budget, whichever first (the 3D configs and the
    # recorded 3DMonitor1 traces run their full nSteps without a DtTol
    # stop); capped at 400 for the fine 2D configs whose recorded runs
    # stopped early
    budget = min(cfg.n_steps, 400)
    for i in range(budget):
        state, info = integ.step(state)
        ih = float(info.ih_start)
        if i != 0 and abs((ih - ih_prev) / cfg.dt) < cfg.dt_tol:
            final = ih
            break
        ih_prev = ih
    if final is None:
        final = ih  # nSteps budget, like the reference's recorded runs
    ref_final = ref_trace(name)[-1]
    assert final <= ref_final + 1e-4
    assert final > floor  # sane attractor, not a collapse


@pytest.mark.slow
def test_cross_method_converged_energy_agreement():
    """SURVEY §4: the reference's correctness oracle is agreement of the
    CONVERGED Ih across the three integrators (experiments.py:221-240).
    The recorded Euler/BE runs both reach 0.813163 on Monitor120
    (Results/Monitor120/Ih{1,2}.txt); the guarded ADMM must land there
    too (the recorded ADMM 0.828926 is the unguarded-predictor artifact —
    see README)."""
    finals = {}
    for method in (0, 1, 2):
        cfg = load_experiment_config(f"{REF}/InputFiles/Monitor120.json")
        cfg.method = method
        mesh, integ = build_problem(cfg)
        _, trace = integ.run(cfg.n_steps, cfg.dt_tol)
        finals[method] = trace[-1]
    ref_final = ref_trace("Monitor120", method=1)[-1]  # 0.813163
    for method, ih in finals.items():
        np.testing.assert_allclose(ih, ref_final, atol=2e-4,
                                   err_msg=f"method {method}")


@pytest.mark.slow
def test_admm_f32_reaches_ref_quality_monitor1320():
    """320-scale f32 regression pin (VERDICT r3 item 7): Monitor1320 must
    reach the reference's converged Ih (0.81342, Results/Monitor1320/
    Ih0.txt last row) within 250 steps on the f32 fast path. The
    160-scale pins above don't cover the finest shipped meshes; the TPU
    bench's headline rides on exactly this trajectory, so a guard or
    predictor regression that breaks it must fail CI. Uses the device
    loop's in-graph target stop — the run ends at the crossing instead of
    the (much later) DtTol stop."""
    cfg = load_experiment_config(f"{REF}/InputFiles/Monitor1320.json")
    cfg.dtype = "float32"
    target = 0.81342
    _, integ = build_problem(cfg)
    state, trace, steps = integ.run_device(
        state=integ.init_state(), cap=250, dt_tol=0.0, target_ih=target
    )
    steps = int(steps)
    tr = np.asarray(trace)
    assert steps < 250, (
        f"never reached {target}: last Ih {tr[~np.isnan(tr)][-1]:.6f}"
    )
    assert tr[steps - 1] <= target


@pytest.mark.slow
def test_admm_f32_comp_mesh_3dmonitor320_converges():
    """CompMesh-family convergence pin at the 40k-tet scale (VERDICT r3
    item 4). 3DMonitor320 (CompMesh: true, xi-mesh Ehat,
    AdaptationFunctional.cpp:176-201) ships NO energy trace
    (Results/3DMonitor320/ holds only plots; ref ADMM wall 32.39 s from
    Data/3DMonitor3/Single3DMonitor320.json), so the pin is the round-4
    measured attractor: the full-nSteps f32 run (the reference's 3D runs
    don't DtTol-stop) must descend from 0.965358 to <= 0.9320 (measured
    0.931529)."""
    cfg = load_experiment_config(f"{REF}/InputFiles/3DMonitor320.json")
    cfg.dtype = "float32"
    _, integ = build_problem(cfg)
    state, trace, steps = integ.run_device(
        state=integ.init_state(), cap=cfg.n_steps, dt_tol=cfg.dt_tol
    )
    steps = int(steps)
    tr = np.asarray(trace)[:steps]
    np.testing.assert_allclose(tr[0], 0.96535841, rtol=1e-5)
    assert tr[-1] <= 0.9320
    assert np.all(np.diff(tr) < 0)  # monotone descent on this config
