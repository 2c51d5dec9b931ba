"""3D component-form Pallas prox (ops/prox_pallas3d.py) vs the vmap
backend and the matrix-form huang oracle."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from mmadmm_tpu.config import ExperimentConfig  # noqa: E402
from mmadmm_tpu.ops import huang, prox_pallas3d  # noqa: E402
from mmadmm_tpu.ops.monitor_grid import gather_cell  # noqa: E402
from mmadmm_tpu.problems import build_problem  # noqa: E402


def _setup(mon_type=2):
    cfg = ExperimentConfig(
        test_type="SquareGrid", dim=3, mon_type=mon_type, method=0,
        nx=4, ny=4, nz=4, dt=5e-3, tau=0.1, rho=50.0, dtype="float32",
    )
    mesh, integ = build_problem(cfg)
    z = mesh.gather(mesh.X0)
    rng = np.random.default_rng(0)
    dxpu = z + jnp.asarray(
        rng.normal(scale=1e-3, size=z.shape), dtype=z.dtype
    )
    return cfg, mesh, z, dxpu


def _components(mesh, z, dxpu):
    nf = z.shape[0]
    zc = [z.reshape(nf, 12)[:, i] for i in range(12)]
    dc = [dxpu.reshape(nf, 12)[:, i] for i in range(12)]
    fc = [mesh.elem_free.reshape(nf, 12)[:, i] for i in range(12)]
    pf = prox_pallas3d.make_prox_pallas3d(mesh.ehat, mesh.w,
                                          interpret=True)
    rows = None
    # reuse the wrapper's cell fetch via its private helper path: call
    # the module-level pieces directly
    from mmadmm_tpu.ops.monitor_grid import _cell_index

    ax, ay, az = mesh.grid.axes
    ncell = ax.shape[0] - 1
    xi = _cell_index(z[..., 0], ax)
    yi = _cell_index(z[..., 1], ay)
    zi = _cell_index(z[..., 2], az)
    bounds = jnp.stack(
        [ax[xi], ax[xi + 1], ay[yi], ay[yi + 1], az[zi], az[zi + 1]],
        axis=-1,
    )
    if mesh.grid.constant:
        flat0 = mesh.grid.values.reshape(-1, 9)[0]
        sym = flat0[jnp.asarray([0, 1, 2, 4, 5, 8])]
        vals = jnp.broadcast_to(jnp.tile(sym, 8), (nf, 4, 48))
    else:
        ci = (zi * ncell + yi) * ncell + xi
        vals = mesh.grid.cell_table[ci.reshape(-1)].reshape(nf, 4, 48)
    rows = jnp.concatenate([vals, bounds], axis=-1)
    cells = [[rows[:, v, k] for k in range(54)] for v in range(4)]
    eh = np.asarray(mesh.ehat, dtype=np.float64).reshape(-1)
    return zc, dc, fc, cells, tuple(float(v) for v in eh)


@pytest.mark.parametrize("mon_type", [1, 2])
def test_component_energy_grad_match_matrix_form_3d(mon_type):
    cfg, mesh, z, dxpu = _setup(mon_type)
    zc, dc, fc, cells, ehat = _components(mesh, z, dxpu)
    g_c, ih_c, _ = prox_pallas3d.grad_c3(zc, cells, ehat, dc, mesh.w, fc)

    gather_cells = jax.vmap(
        jax.vmap(gather_cell, in_axes=(None, 0)), in_axes=(None, 0)
    )
    cells_m = gather_cells(mesh.grid, z)
    ih_m, g_m = jax.vmap(
        lambda zz, cc, dd: huang.element_energy_grad(
            zz, None, None, mesh.ehat, False, dxpu=dd, w=mesh.w, cells=cc
        )
    )(z, cells_m, dxpu)
    np.testing.assert_allclose(
        np.asarray(ih_c), np.asarray(ih_m), rtol=2e-5, atol=1e-7
    )
    g_m = np.asarray(g_m * mesh.elem_free).reshape(-1, 12)
    g_c = np.stack([np.asarray(g) for g in g_c], axis=1)
    scale = np.abs(g_m).max()
    np.testing.assert_allclose(g_c, g_m, rtol=3e-4, atol=3e-5 * scale)


def test_kernel_prox_matches_vmap_backend_3d():
    cfg, mesh, z, dxpu = _setup(2)
    pf = prox_pallas3d.make_prox_pallas3d(mesh.ehat, mesh.w,
                                          interpret=True)
    z_p, ih0_p = pf(mesh.grid, z, mesh.xi, dxpu, mesh.elem_free, 1e-5, 50)
    z_v, ih0_v = mesh.prox(z, mesh.xi, dxpu, mesh.elem_free, 1e-5, 50)
    np.testing.assert_allclose(
        np.asarray(ih0_p), np.asarray(ih0_v), rtol=2e-5, atol=1e-7
    )

    def reg_energy(zz):
        e = mesh._energy_e(zz, mesh.xi, mesh.grid)
        return np.asarray(
            e + 0.5 * mesh.w**2 * jnp.sum((dxpu - zz) ** 2, axis=(1, 2))
        )

    e_p = reg_energy(jnp.asarray(z_p))
    e_v = reg_energy(jnp.asarray(z_v))
    np.testing.assert_allclose(e_p, e_v, rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_admm_with_pallas3d_backend_converges():
    cfg = ExperimentConfig(
        test_type="SquareGrid", dim=3, mon_type=1, method=0,
        nx=4, ny=4, nz=4, dt=5e-3, tau=0.1, rho=50.0, dtype="float32",
        prox_backend="pallas",
    )
    mesh, integ = build_problem(cfg)
    assert mesh.prox_backend == "pallas" and not integ.j_carry
    s = integ.init_state()
    tr = []
    for _ in range(10):
        s, info = integ.step(s)
        tr.append(float(info.ih_start))
    cfg2 = ExperimentConfig(
        test_type="SquareGrid", dim=3, mon_type=1, method=0,
        nx=4, ny=4, nz=4, dt=5e-3, tau=0.1, rho=50.0, dtype="float32",
    )
    _, integ2 = build_problem(cfg2)
    s2 = integ2.init_state()
    tr2 = []
    for _ in range(10):
        s2, info2 = integ2.step(s2)
        tr2.append(float(info2.ih_start))
    np.testing.assert_allclose(tr[0], tr2[0], rtol=2e-6)
    assert abs(tr[-1] - tr2[-1]) < 5e-4 * max(abs(tr2[-1]), 1.0)


def test_kernel_prox_comp_mesh_matches_vmap():
    """CompMesh (xi-mesh Ehat as per-element tiles): the kernel must
    match the vmap backend on the 3DMonitor3-family configuration."""
    cfg = ExperimentConfig(
        test_type="SquareGrid", dim=3, mon_type=5, method=0,
        nx=4, ny=4, nz=4, dt=5e-3, tau=0.1, rho=10.0, dtype="float32",
        comp_mesh=True,
    )
    mesh, integ = build_problem(cfg)
    assert mesh.comp_mesh
    z = mesh.gather(mesh.X0)
    rng = np.random.default_rng(1)
    dxpu = z + jnp.asarray(
        rng.normal(scale=1e-3, size=z.shape), dtype=z.dtype
    )
    pf = prox_pallas3d.make_prox_pallas3d(
        mesh.ehat, mesh.w, comp_mesh=True, interpret=True
    )
    z_p, ih0_p = pf(mesh.grid, z, mesh.xi, dxpu, mesh.elem_free, 1e-5, 50)
    z_v, ih0_v = mesh.prox(z, mesh.xi, dxpu, mesh.elem_free, 1e-5, 50)
    np.testing.assert_allclose(
        np.asarray(ih0_p), np.asarray(ih0_v), rtol=3e-5, atol=1e-7
    )
    # CHORD mode (the round-5 default for comp-mesh meshes): cached-J
    # sweeps with refresh-on-rejection must land on the same optimum
    pf_ch = prox_pallas3d.make_prox_pallas3d(
        mesh.ehat, mesh.w, comp_mesh=True, chord=True, interpret=True
    )
    z_c, ih0_c = pf_ch(
        mesh.grid, z, mesh.xi, dxpu, mesh.elem_free, 1e-5, 50
    )
    np.testing.assert_allclose(
        np.asarray(ih0_c), np.asarray(ih0_v), rtol=3e-5, atol=1e-7
    )

    def reg_energy(zz):
        e = mesh._energy_e(zz, mesh.xi, mesh.grid)
        return np.asarray(
            e + 0.5 * mesh.w**2 * jnp.sum((dxpu - zz) ** 2, axis=(1, 2))
        )

    np.testing.assert_allclose(
        reg_energy(jnp.asarray(z_p)), reg_energy(jnp.asarray(z_v)),
        rtol=2e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        reg_energy(jnp.asarray(z_c)), reg_energy(jnp.asarray(z_v)),
        rtol=2e-4, atol=1e-6,
    )
