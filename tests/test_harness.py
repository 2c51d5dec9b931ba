"""Harness tests: runner artifacts, chunked stepping, checkpoint round-trip,
sweeps, plots."""

import json
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from mmadmm_tpu.config import ExperimentConfig  # noqa: E402
from mmadmm_tpu.harness.runner import run_experiment  # noqa: E402
from mmadmm_tpu.harness.checkpoint import (  # noqa: E402
    latest_checkpoint,
    resume_experiment,
    save_checkpoint,
)


def tiny_cfg(method=0, **kw):
    return ExperimentConfig(
        name="tiny", test_type="SquareGrid", dim=2, mon_type=1,
        method=method, nx=6, ny=6, n_steps=6, dt=5e-3, tau=0.1, rho=50.0,
        dt_tol=1e-12, **kw,
    )


def test_runner_writes_reference_format_artifacts(tmp_path):
    out = str(tmp_path / "out")
    res = run_experiment(tiny_cfg(), out_dir=out)
    assert res.n_steps == 6
    assert os.path.exists(os.path.join(out, "points.txt"))
    assert os.path.exists(os.path.join(out, "triangles.txt"))
    trace = np.loadtxt(os.path.join(out, "Ih0.txt"), delimiter=",", ndmin=2)
    assert trace.shape[0] == len(res.ih_trace)
    with open(os.path.join(out, "summary.json")) as f:
        s = json.load(f)
    assert s["n_steps"] == 6

    # the mesh file round-trips through the FromFile reader
    from mmadmm_tpu.geometry.io import read_mesh

    X, F, mask = read_mesh(
        os.path.join(out, "triangles.txt"),
        os.path.join(out, "points.txt"),
        os.path.join(out, "mask.txt"),
    )
    assert X.shape[1] == 2 and F.shape[1] == 3 and mask.shape[0] == X.shape[0]


@pytest.mark.slow
def test_chunked_matches_stepwise():
    r1 = run_experiment(tiny_cfg(), step_chunk=1)
    r3 = run_experiment(tiny_cfg(), step_chunk=3)
    np.testing.assert_allclose(r1.ih_trace, r3.ih_trace, rtol=1e-12)


def test_checkpoint_resume_bit_exact(tmp_path):
    from mmadmm_tpu.problems import build_problem

    cfg = tiny_cfg()
    mesh, integ = build_problem(cfg)
    state = integ.init_state()
    for _ in range(3):
        state, _ = integ.step(state)
    save_checkpoint(str(tmp_path), cfg, mesh, state, 3)
    _, _, integ2, state2 = resume_experiment(latest_checkpoint(str(tmp_path)))
    _, i1 = integ.step(state)
    _, i2 = integ2.step(state2)
    assert float(i1.ih_start) == float(i2.ih_start)


@pytest.mark.slow
def test_run_resume_continues_exactly(tmp_path):
    """run.py --resume path: a run checkpointed at step 3 and resumed
    finishes with the same node positions and final Ih as the
    uninterrupted run (bit-exact: state round-trips through f64 npz)."""
    out_full = str(tmp_path / "full")
    r_full = run_experiment(tiny_cfg(), out_dir=out_full)

    out_a = str(tmp_path / "a")
    run_experiment(tiny_cfg(), out_dir=out_a, checkpoint_every=3)
    ckpt = os.path.join(out_a, "checkpoints", "step_000003.npz")
    assert os.path.exists(ckpt)

    out_b = str(tmp_path / "b")
    r_b = run_experiment(tiny_cfg(), out_dir=out_b, resume_from=ckpt)
    assert r_b.n_steps == r_full.n_steps == 6
    assert r_b.final_ih == r_full.final_ih
    pts_full = np.loadtxt(os.path.join(out_full, "points.txt"), delimiter=",")
    pts_b = np.loadtxt(os.path.join(out_b, "points.txt"), delimiter=",")
    np.testing.assert_array_equal(pts_full, pts_b)


@pytest.mark.slow
def test_simultaneous_sweep_and_size_plot(tmp_path):
    """run_simultaneous_experiment pairs sorted configs with 2^i shards and
    writes Simul*.json (experiments.py:470-501); run_grid_scale records
    n_elements so the time-vs-simplices plot (plot_single_thread_increase
    analogue) can render."""
    from mmadmm_tpu.harness import experiments as exps

    in_dir = str(tmp_path / "inputs")
    for n in (4, 6):
        exps.make_config_json(
            os.path.join(in_dir, f"Tiny{n}.json"),
            mon_type=1, n_steps=2, dt=5e-3, nx=n, dt_tol=1e-12,
        )
    out = exps.run_simultaneous_experiment(
        in_dir, "Tiny", out_dir=str(tmp_path / "data"), n_repeats=1
    )
    assert set(out["configs"]) == {"Tiny4", "Tiny6"}
    # i-th config runs with 2^i shards
    assert list(out["configs"]["Tiny4"]) == ["(0, 1)"]
    assert list(out["configs"]["Tiny6"]) == ["(1, 2)"]
    with open(tmp_path / "data" / "SimulTiny6.json") as f:
        rec = json.load(f)
    assert len(rec["(1, 2)"]) == 1

    scale = exps.run_grid_scale(in_dir, "Tiny", methods=(0,))
    assert scale["configs"]["4"]["0"]["n_elements"] == 4 * 4 * 4
    pytest.importorskip("matplotlib")
    from mmadmm_tpu.harness.plotting import plot_time_vs_simplices

    p = plot_time_vs_simplices(scale, str(tmp_path / "sz.png"))
    assert os.path.getsize(p) > 0


def test_plots_render(tmp_path):
    pytest.importorskip("matplotlib")
    from mmadmm_tpu.geometry.node_type import NodeType
    from mmadmm_tpu.geometry.rect_mesh import generate_uniform_rect_mesh
    from mmadmm_tpu.harness.plotting import plot_energy_decrease, plot_mesh_2d

    X, F, _ = generate_uniform_rect_mesh(
        2, 4, 4, 0, 0, 1, 0, 1, 0, 1, NodeType.BOUNDARY_FIXED
    )
    p1 = plot_mesh_2d(X, F, str(tmp_path / "mesh.png"))
    p2 = plot_energy_decrease(
        {"admm": ([0, 1, 2], [1.0, 0.9, 0.85])}, str(tmp_path / "e.png")
    )
    assert os.path.getsize(p1) > 0 and os.path.getsize(p2) > 0


def test_levelset_circle_end_to_end():
    """The reference README's headline example: adapt a level-set-carved
    circle domain (setUpLevelSetExperiment, main.cpp:257-401; circle phi
    main.cpp:33-40). No shipped config exists for it, so the oracle is
    qualitative: ADMM runs, energy is finite and decreases.

    The carved mesh has near-boundary slivers (min |det E| ~15x below the
    interior), so the gradient flow is stiffer than the SquareGrid/Shoulder
    configs — dt=1e-4 is stable where the Monitor* families use 5e-3; at
    that dt ADMM and explicit Euler agree and decrease monotonically."""
    from mmadmm_tpu.config import ExperimentConfig
    from mmadmm_tpu.problems import build_problem
    from mmadmm_tpu.config import ExperimentConfig
    from mmadmm_tpu.problems import build_problem

    cfg = ExperimentConfig(
        name="circle", test_type="LevelSet", dim=2, mon_type=0, method=0,
        nx=12, ny=12, n_steps=6, dt=1e-4, tau=0.1, rho=50.0, dt_tol=1e-12,
    )
    mesh, integ = build_problem(cfg)
    state = integ.init_state()
    ihs = [float(mesh.energy(state.x))]
    for _ in range(6):
        state, info = integ.step(state)
        ihs.append(float(info.ih_start))
    assert all(np.isfinite(ihs))
    # monotone decrease from step 2 on (step 1 repeats the initial energy)
    assert all(b < a for a, b in zip(ihs[1:-1], ihs[2:]))
    assert ihs[-1] < ihs[0]
