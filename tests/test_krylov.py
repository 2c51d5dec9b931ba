"""Unit tests for ops.krylov (the accel_class replacement) and the
backward-Euler integrator's use of it."""

import numpy as np
import pytest

import conftest  # noqa: F401  (forces CPU + 8 virtual devices)
import jax.numpy as jnp

from mmadmm_tpu.ops import krylov


def _random_spd(n, seed):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((n, n))
    return A @ A.T + n * np.eye(n)


def test_cg_matches_direct_solve():
    A = _random_spd(40, 0)
    b = np.random.default_rng(1).standard_normal(40)
    x, (iters, rnorm2) = krylov.cg(
        lambda v: jnp.asarray(A) @ v, jnp.asarray(b), tol=1e-12, maxiter=200
    )
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(A, b),
                               rtol=1e-8, atol=1e-8)
    assert int(iters) < 200


def test_bicgstab_matches_direct_solve_nonsymmetric():
    rng = np.random.default_rng(2)
    n = 40
    A = rng.standard_normal((n, n)) * 0.1 + np.eye(n) * 4.0  # dom. diagonal
    b = rng.standard_normal(n)
    x, (iters, rnorm2) = krylov.bicgstab(
        lambda v: jnp.asarray(A) @ v, jnp.asarray(b), tol=1e-12, maxiter=200
    )
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(A, b),
                               rtol=1e-7, atol=1e-8)
    assert int(iters) < 200


def test_bicgstab_masked_convergence_freezes():
    """Extra fori iterations past convergence must not change the answer
    (the masked-update no-op property the fixed-trip design relies on)."""
    A = _random_spd(16, 3)
    b = np.random.default_rng(4).standard_normal(16)
    mv = lambda v: jnp.asarray(A) @ v
    x1, (i1, _) = krylov.bicgstab(mv, jnp.asarray(b), tol=1e-10, maxiter=30)
    x2, (i2, _) = krylov.bicgstab(mv, jnp.asarray(b), tol=1e-10, maxiter=300)
    assert int(i1) == int(i2)
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))


def test_bicgstab_zero_rhs():
    """b = 0 must return x = 0 with no NaNs (breakdown safeguards)."""
    A = _random_spd(8, 5)
    x, _ = krylov.bicgstab(lambda v: jnp.asarray(A) @ v, jnp.zeros(8))
    np.testing.assert_array_equal(np.asarray(x), np.zeros(8))


@pytest.mark.parametrize("solver", ["cg", "scipy", "hess", "neumann"])
def test_backward_euler_solver_agreement(solver):
    """The default hess BE path (explicit element Hessians + unrolled
    CGSTAB) matches the jvp-matvec paths (cgstab/cg fori, round-3
    jax.scipy) on a real config — same Newton systems, same trajectories
    to solver tolerance."""
    from mmadmm_tpu.config import load_experiment_config
    from mmadmm_tpu.problems import build_problem

    if not conftest.reference_available():
        pytest.skip("reference not mounted")
    cfg = load_experiment_config(
        "/root/reference/Experiments/InputFiles/Monitor120.json", method=2
    )
    traces = {}
    for name in ("cgstab", solver):
        _, integ = build_problem(cfg)
        integ_cls = type(integ)
        integ = integ_cls(integ.mesh, cfg.dt, tol=cfg.step_tol,
                          krylov_solver=name)
        state = integ.init_state()
        tr = []
        for _ in range(5):
            state, ih = integ.step(state)
            tr.append(ih)
        traces[name] = np.asarray(tr)
    # cg/scipy/hess solve the Newton systems to 1e-6 Krylov tolerance —
    # trajectories match the cgstab path to 1e-9. neumann is a CHORD
    # inexact-Newton (Jacobian frozen at the step's initial guess,
    # 6 Richardson terms — the reference's own chord policy,
    # Mesh.cpp:1284/1303): iterates agree to inexact-solve slop only.
    rtol = 1e-5 if solver == "neumann" else 1e-9
    np.testing.assert_allclose(traces["cgstab"], traces[solver],
                               rtol=rtol, atol=0)
