"""Component-form Pallas prox (ops/prox_pallas2d.py) vs the vmap backend.

The component energy/gradient must match the matrix-form huang oracle to
f32 tolerance on real mesh data, and the full kernel (interpreter mode on
CPU) must drive the same ADMM trajectory to the same attractor."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from mmadmm_tpu.config import ExperimentConfig  # noqa: E402
from mmadmm_tpu.ops import huang, prox_pallas2d  # noqa: E402
from mmadmm_tpu.ops.monitor_grid import gather_cell  # noqa: E402
from mmadmm_tpu.problems import build_problem  # noqa: E402


def _setup():
    cfg = ExperimentConfig(
        test_type="SquareGrid", dim=2, mon_type=1, method=0,
        nx=8, ny=8, dt=5e-3, tau=0.1, rho=50.0, dtype="float32",
    )
    mesh, integ = build_problem(cfg)
    z = mesh.gather(mesh.X0)
    rng = np.random.default_rng(0)
    dxpu = z + jnp.asarray(
        rng.normal(scale=1e-3, size=z.shape), dtype=z.dtype
    )
    return cfg, mesh, z, dxpu


def _components(mesh, z, dxpu):
    """Build the kernel's component views (plain arrays, no tiling)."""
    nf = z.shape[0]
    zc = [z.reshape(nf, 6)[:, i] for i in range(6)]
    dc = [dxpu.reshape(nf, 6)[:, i] for i in range(6)]
    fc = [mesh.elem_free.reshape(nf, 6)[:, i] for i in range(6)]
    from mmadmm_tpu.ops.monitor_grid import _cell_index

    ax, ay = mesh.grid.axes
    nx = ax.shape[0] - 1
    xi_i = _cell_index(z[..., 0], ax)
    yi_i = _cell_index(z[..., 1], ay)
    rows = mesh.grid.cell_table[(yi_i * nx + xi_i).reshape(-1)]
    rows = rows.reshape(nf, 3, 16)
    cells = [[rows[:, v, k] for k in range(16)] for v in range(3)]
    eh = np.asarray(mesh.ehat, dtype=np.float64).reshape(-1)
    ehat = tuple(float(v) for v in eh)
    return zc, dc, fc, cells, ehat


def test_component_energy_matches_matrix_form():
    cfg, mesh, z, dxpu = _setup()
    zc, dc, fc, cells, ehat = _components(mesh, z, dxpu)
    ih_c, ereg_c = prox_pallas2d.energy_c(zc, cells, ehat, dc, mesh.w)

    gather_cells = jax.vmap(
        jax.vmap(gather_cell, in_axes=(None, 0)), in_axes=(None, 0)
    )
    cells_m = gather_cells(mesh.grid, z)
    ih_m = jax.vmap(
        lambda zz, cc: huang.element_energy(
            zz, None, None, mesh.ehat, False, cells=cc
        )
    )(z, cells_m)
    np.testing.assert_allclose(
        np.asarray(ih_c), np.asarray(ih_m), rtol=2e-5, atol=1e-8
    )


def test_component_gradient_matches_matrix_form():
    cfg, mesh, z, dxpu = _setup()
    zc, dc, fc, cells, ehat = _components(mesh, z, dxpu)
    g_c, ih_c, _ = prox_pallas2d.grad_c(zc, cells, ehat, dc, mesh.w, fc)

    gather_cells = jax.vmap(
        jax.vmap(gather_cell, in_axes=(None, 0)), in_axes=(None, 0)
    )
    cells_m = gather_cells(mesh.grid, z)
    ih_m, g_m = jax.vmap(
        lambda zz, cc, dd: huang.element_energy_grad(
            zz, None, None, mesh.ehat, False, dxpu=dd, w=mesh.w, cells=cc
        )
    )(z, cells_m, dxpu)
    g_m = np.asarray(g_m * mesh.elem_free).reshape(-1, 6)
    g_c = np.stack([np.asarray(g) for g in g_c], axis=1)
    scale = np.abs(g_m).max()
    np.testing.assert_allclose(g_c, g_m, rtol=2e-4, atol=2e-5 * scale)
    np.testing.assert_allclose(
        np.asarray(ih_c), np.asarray(ih_m), rtol=2e-5, atol=1e-8
    )


def test_kernel_prox_matches_vmap_backend():
    """Full interpreted kernel vs the vmap prox on one call: same retire
    outcome (energies after the solve agree to f32 tolerance)."""
    cfg, mesh, z, dxpu = _setup()
    pallas_prox = prox_pallas2d.make_prox_pallas2d(
        mesh.ehat, mesh.w, interpret=True
    )
    z_p, ih0_p = pallas_prox(
        mesh.grid, z, mesh.xi, dxpu, mesh.elem_free, 1e-5, 50
    )
    z_v, ih0_v = mesh.prox(z, mesh.xi, dxpu, mesh.elem_free, 1e-5, 50)
    np.testing.assert_allclose(
        np.asarray(ih0_p), np.asarray(ih0_v), rtol=2e-5, atol=1e-8
    )
    # both minimize the same strongly-convex subproblems: the optimized
    # REGULARIZED energies must agree tightly even if iterates differ
    def reg_energy(zz):
        e = mesh._energy_e(zz, mesh.xi, mesh.grid)
        return np.asarray(
            e + 0.5 * mesh.w**2
            * jnp.sum((dxpu - zz) ** 2, axis=(1, 2))
        )

    e_p, e_v = reg_energy(jnp.asarray(z_p)), reg_energy(jnp.asarray(z_v))
    np.testing.assert_allclose(e_p, e_v, rtol=5e-5, atol=1e-7)


@pytest.mark.slow
def test_admm_with_pallas_backend_converges():
    cfg = ExperimentConfig(
        test_type="SquareGrid", dim=2, mon_type=1, method=0,
        nx=8, ny=8, dt=5e-3, tau=0.1, rho=50.0, dtype="float32",
        prox_backend="pallas",
    )
    mesh, integ = build_problem(cfg)
    assert mesh.prox_backend == "pallas" and not integ.j_carry
    s = integ.init_state()
    tr = []
    for _ in range(15):
        s, info = integ.step(s)
        tr.append(float(info.ih_start))
    # same attractor as the vmap backend
    cfg2 = ExperimentConfig(
        test_type="SquareGrid", dim=2, mon_type=1, method=0,
        nx=8, ny=8, dt=5e-3, tau=0.1, rho=50.0, dtype="float32",
    )
    _, integ2 = build_problem(cfg2)
    s2 = integ2.init_state()
    tr2 = []
    for _ in range(15):
        s2, info2 = integ2.step(s2)
        tr2.append(float(info2.ih_start))
    np.testing.assert_allclose(tr[0], tr2[0], rtol=2e-6)  # ih0 identical
    assert abs(tr[-1] - tr2[-1]) < 5e-5
