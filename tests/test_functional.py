"""Huang functional, gradient, and prox unit tests.

The reference has no unit tests (SURVEY §4); these cover the math core the
reference only validated through recorded experiment artifacts.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from mmadmm_tpu.geometry.node_type import NodeType  # noqa: E402
from mmadmm_tpu.geometry.rect_mesh import generate_uniform_rect_mesh  # noqa: E402
from mmadmm_tpu.mesh import MovingMesh  # noqa: E402
from mmadmm_tpu.monitors import get_monitor  # noqa: E402
from mmadmm_tpu.ops import huang  # noqa: E402


def small_mesh(dim=2, mon_type=0, nx=4):
    X, F, mask = generate_uniform_rect_mesh(
        dim, nx, nx, nx, 0.0, 1.0, 0.0, 1.0, 0.0, 1.0, NodeType.BOUNDARY_FIXED
    )
    monitor = get_monitor(dim, mon_type)
    return MovingMesh(X, F, mask, monitor, rho=50.0, tau=0.1)


@pytest.mark.parametrize("dim", [2, 3])
def test_gradient_matches_fd_identity_monitor(dim):
    """With the identity monitor the simplex-linear monitor-derivative terms
    vanish, so the analytic gradient must equal the FD gradient of the
    energy (reference check: blockGrad vs its own energy,
    AdaptationFunctional.cpp:103-287)."""
    mesh = small_mesh(dim=dim, mon_type=0)  # MonType 0 = MEx0 identity
    rng = np.random.default_rng(0)
    z0 = np.asarray(mesh.gather(mesh.X0))
    # perturb interior-ish: keep orientation positive with a small shake
    z = z0 + 0.01 * rng.standard_normal(z0.shape)

    def e_one(zf):
        return huang.element_energy(
            zf, mesh.xi[0], mesh.grid, mesh.ehat, mesh.comp_mesh
        )

    for ei in range(3):
        zi = jnp.asarray(z[ei])
        _, g = huang.element_energy_grad(
            zi, mesh.xi[ei], mesh.grid, mesh.ehat, mesh.comp_mesh
        )
        h = 1e-6
        g_fd = np.zeros_like(np.asarray(g))
        for a in range(zi.shape[0]):
            for b in range(zi.shape[1]):
                zp = zi.at[a, b].add(h)
                zm = zi.at[a, b].add(-h)
                g_fd[a, b] = (
                    float(
                        huang.element_energy(
                            zp, mesh.xi[ei], mesh.grid, mesh.ehat, False
                        )
                    )
                    - float(
                        huang.element_energy(
                            zm, mesh.xi[ei], mesh.grid, mesh.ehat, False
                        )
                    )
                ) / (2 * h)
        np.testing.assert_allclose(np.asarray(g), g_fd, rtol=1e-4, atol=1e-7)


def test_regularized_gradient_term():
    """The prox regularization adds exactly w^2 (z - dxpu) to the gradient
    (AdaptationFunctional.cpp:279-282)."""
    mesh = small_mesh()
    z = mesh.gather(mesh.X0)[0]
    dxpu = z + 0.1
    w = 2.0
    _, g0 = huang.element_energy_grad(
        z, mesh.xi[0], mesh.grid, mesh.ehat, False
    )
    _, g1 = huang.element_energy_grad(
        z, mesh.xi[0], mesh.grid, mesh.ehat, False, dxpu=dxpu, w=w
    )
    np.testing.assert_allclose(
        np.asarray(g1 - g0), np.asarray(w * w * (z - dxpu)), rtol=1e-12
    )


def test_prox_decreases_regularized_energy():
    mesh = small_mesh(mon_type=0)
    z = mesh.gather(mesh.X0)
    rng = np.random.default_rng(1)
    dxpu = z + 0.02 * rng.standard_normal(z.shape)
    w = mesh.w

    def reg_energy(zv):
        e = jax.vmap(
            lambda zz, xi, dd: huang.element_energy(
                zz, xi, mesh.grid, mesh.ehat, False, dxpu=dd, w=w
            )
        )(zv, mesh.xi, jnp.asarray(dxpu))
        return float(jnp.sum(e))

    e_before = reg_energy(z)
    z_new, ih0 = mesh.prox(
        z, mesh.xi, jnp.asarray(dxpu), mesh.elem_free, 1e-6, 50
    )
    e_after = reg_energy(z_new)
    assert np.isfinite(e_after)
    assert e_after <= e_before
    # ih0 is the unregularized energy at the INPUT z
    e_in = float(mesh.energy_of_z(z))
    np.testing.assert_allclose(float(jnp.sum(ih0)), e_in, rtol=1e-10)


def test_prox_keeps_orientation():
    from mmadmm_tpu.ops.huang import _det

    mesh = small_mesh(mon_type=0)
    z = mesh.gather(mesh.X0)
    rng = np.random.default_rng(2)
    dxpu = z + 0.05 * rng.standard_normal(z.shape)
    z_new, _ = mesh.prox(
        z, mesh.xi, jnp.asarray(dxpu), mesh.elem_free, 1e-6, 50
    )
    zm = np.asarray(z_new)
    E = np.swapaxes(zm[:, 1:] - zm[:, :1], 1, 2)
    dets = np.asarray(_det(jnp.asarray(E)))
    assert (dets > 0).all()
