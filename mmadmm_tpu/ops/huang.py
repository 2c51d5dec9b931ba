"""Huang mesh-adaptation functional: per-element energy and gradient.

Re-derives ``AdaptationFunctional::blockGrad`` (reference
``src/AdaptationFunctional.cpp:103-287``) as closed-form, branch-free JAX
suitable for vmap over the element batch and for fusion into a Pallas
kernel. D in {2, 3} is static; all matrix inverses/determinants are closed
form.

Per element with stacked vertex vector z in R^{(D+1) x D}:

  mPre_i = M(z_i) sampled from the monitor grid           (:143-153)
  Minv   = (sum_i mPre_i)^{-1} / (D+1)                    (:157)
  E      = [z_1 - z_0, ..., z_D - z_0] (columns)          (:163-169)
  Ehat   = reference simplex edge matrix, normalized to
           det = dFact/N (no computational mesh,          (:176-201)
           dFact = D!), or the xi-mesh edge matrix (compMesh)
  FJ     = Ehat E^{-1}, detFJ = det(FJ)                   (:206-207)
  G      = theta sqrt(det M) tr(FJ Minv FJ^T)^{dp/2}
           + (1-2 theta) d^{dp/2} sqrt(det M) (detFJ/sqrt(det M))^p
           with p = 3/2, theta = 1/3, sqrt(det M) := 1/sqrt(det Minv)
                                                         (:210-220)
  Ih     = |det E| / dFact * G                            (:222, :274)
  [+ 0.5 w^2 || DXpU_e - z ||^2 when regularized]         (:226, :280)

The gradient is the reference's hand-derived formula (:232-271) — including
its simplex-linear treatment of the monitor's spatial dependence via
(mPre_n - mPre_0) trace contractions — NOT the autodiff gradient of the
sampled energy; the two differ at the monitor-interpolation level and the
recorded baselines converged under the former. An autodiff oracle is
provided for cross-checking (`element_energy` is differentiable end-to-end).

NaN-robustness: the reference aborts on inverted elements
(``assert(Edet > 0)``, :174). Here ``detFJ`` and the trace are clamped to a
tiny positive floor so fractional powers never see a negative base; inverted
elements get large-but-finite energies and recover via the w^2 proximal
pull-back instead of crashing the step.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from .monitor_grid import MonitorGrid, sample_frozen, sample_monitor

P_EXP = 1.5  # AdaptationFunctional.cpp:210
THETA = 1.0 / 3.0  # :211
_DET_FLOOR = 1e-30


def d_factorial(D: int) -> float:
    return 2.0 if D == 2 else 6.0  # :128-132


def reference_ehat(D: int, n_elements: int) -> jnp.ndarray:
    """The constant reference edge matrix used when there is no
    computational mesh (:176-201): a fixed simplex edge matrix normalized so
    |det Ehat| = dFact, then scaled by N^{-1/D}."""
    if D == 2:
        base = jnp.array([[1.0, 0.5], [0.0, math.sqrt(3.0) / 2.0]])
    else:
        base = jnp.array(
            [[-2.0, 0.0, -2.0], [0.0, -2.0, -2.0], [-2.0, -2.0, 0.0]]
        )
    dfact = d_factorial(D)
    det = jnp.abs(jnp.linalg.det(base))
    base = base * (dfact / det) ** (1.0 / D)
    return base / float(n_elements) ** (1.0 / D)


# --- closed-form small linear algebra --------------------------------------
#
# NOTE: these deliberately avoid `@`/einsum/dot_general. On TPU, f32
# dot_general defaults to bf16 MXU passes (~1e-3 relative error — measured
# as a 0.8% energy deviation on Monitor120), and tiny D x D products belong
# on the VPU anyway. Broadcast-multiply + sum stays in full f32/f64.


def _mm(A, B):
    """Matrix product over the last two axes, elementwise (VPU, full
    precision): C[..., i, j] = sum_k A[..., i, k] B[..., k, j]."""
    return jnp.sum(A[..., :, :, None] * B[..., None, :, :], axis=-2)


def _det(A):
    D = A.shape[-1]
    if D == 2:
        return A[..., 0, 0] * A[..., 1, 1] - A[..., 0, 1] * A[..., 1, 0]
    return (
        A[..., 0, 0] * (A[..., 1, 1] * A[..., 2, 2] - A[..., 1, 2] * A[..., 2, 1])
        - A[..., 0, 1] * (A[..., 1, 0] * A[..., 2, 2] - A[..., 1, 2] * A[..., 2, 0])
        + A[..., 0, 2] * (A[..., 1, 0] * A[..., 2, 1] - A[..., 1, 1] * A[..., 2, 0])
    )


def _inv(A, det=None):
    D = A.shape[-1]
    if det is None:
        det = _det(A)
    if D == 2:
        adj = jnp.stack(
            [
                jnp.stack([A[..., 1, 1], -A[..., 0, 1]], -1),
                jnp.stack([-A[..., 1, 0], A[..., 0, 0]], -1),
            ],
            -2,
        )
        return adj / det[..., None, None]
    c00 = A[..., 1, 1] * A[..., 2, 2] - A[..., 1, 2] * A[..., 2, 1]
    c01 = A[..., 0, 2] * A[..., 2, 1] - A[..., 0, 1] * A[..., 2, 2]
    c02 = A[..., 0, 1] * A[..., 1, 2] - A[..., 0, 2] * A[..., 1, 1]
    c10 = A[..., 1, 2] * A[..., 2, 0] - A[..., 1, 0] * A[..., 2, 2]
    c11 = A[..., 0, 0] * A[..., 2, 2] - A[..., 0, 2] * A[..., 2, 0]
    c12 = A[..., 0, 2] * A[..., 1, 0] - A[..., 0, 0] * A[..., 1, 2]
    c20 = A[..., 1, 0] * A[..., 2, 1] - A[..., 1, 1] * A[..., 2, 0]
    c21 = A[..., 0, 1] * A[..., 2, 0] - A[..., 0, 0] * A[..., 2, 1]
    c22 = A[..., 0, 0] * A[..., 1, 1] - A[..., 0, 1] * A[..., 1, 0]
    adj = jnp.stack(
        [
            jnp.stack([c00, c01, c02], -1),
            jnp.stack([c10, c11, c12], -1),
            jnp.stack([c20, c21, c22], -1),
        ],
        -2,
    )
    return adj / det[..., None, None]


# --- core per-element computation ------------------------------------------

def _common_terms(z, xi, grid: MonitorGrid, ehat_const, comp_mesh: bool,
                  cells=None):
    """Shared between energy and gradient. z: [D+1, D].

    ``cells``: optional frozen interpolation cells (one per vertex, leading
    axis D+1) — replaces the grid gather with pure arithmetic inside hot
    loops (see ``monitor_grid.gather_cell``)."""
    D = z.shape[-1]
    if cells is not None:
        m_pre = jax.vmap(sample_frozen)(cells, z)  # [D+1, D, D]
    else:
        m_pre = jax.vmap(lambda p: sample_monitor(grid, p))(z)  # [D+1, D, D]
    m_sum = jnp.sum(m_pre, axis=0)
    minv = _inv(m_sum) / (D + 1.0)  # :157 (verbatim, incl. the 1/(D+1))

    E = jnp.swapaxes(z[1:] - z[0], 0, 1)  # columns are edges (:163-169)
    if comp_mesh:
        ehat = jnp.swapaxes(xi[1:] - xi[0], 0, 1)
    else:
        ehat = ehat_const
    edet = _det(E)
    einv = _inv(E, edet)
    fj = _mm(ehat, einv)  # :206
    det_fj = _det(fj)

    d = float(D)
    fjt = fj.T
    minv_jt = _mm(minv, fjt)
    # tr(FJ Minv FJ^T) without forming the product matrix
    tr = jnp.sum(fj * jnp.swapaxes(minv_jt, -1, -2))
    det_m = jnp.sqrt(1.0 / jnp.maximum(_det(minv), _DET_FLOOR))  # :217

    tr_c = jnp.maximum(tr, _DET_FLOOR)
    det_fj_c = jnp.maximum(det_fj, _DET_FLOOR)

    dp2 = d * P_EXP / 2.0
    G = THETA * det_m * tr_c**dp2 + (1.0 - 2.0 * THETA) * d**dp2 * det_m * (
        det_fj_c / det_m
    ) ** P_EXP  # :219-220
    abs_k = jnp.abs(edet / d_factorial(D))  # :222
    return dict(
        m_pre=m_pre, minv=minv, einv=einv, fj=fj, fjt=fjt, minv_jt=minv_jt,
        tr=tr_c, det_m=det_m, det_fj=det_fj_c, G=G, abs_k=abs_k, d=d, dp2=dp2,
    )


def element_energy(z, xi, grid, ehat_const, comp_mesh, dxpu=None, w=None,
                   cells=None):
    """Ih for one element (:224-229); + prox regularization if dxpu given."""
    t = _common_terms(z, xi, grid, ehat_const, comp_mesh, cells)
    ih = t["abs_k"] * t["G"]
    if dxpu is not None:
        ih = ih + 0.5 * w * w * jnp.sum((dxpu - z) ** 2)
    return ih


def element_energy_grad(z, xi, grid, ehat_const, comp_mesh, dxpu=None, w=None,
                        cells=None):
    """(Ih, grad[D+1, D]) replicating the reference's analytic gradient
    (:232-282). Returns the *unregularized* energy as Igt (:276) plus the
    regularized gradient when ``dxpu`` is given — matching how the prox path
    consumes it (``Mesh::bfgsOptSimplex`` keeps Ihsave = Igt,
    ``Mesh.cpp:791-792``)."""
    t = _common_terms(z, xi, grid, ehat_const, comp_mesh, cells)
    D = z.shape[-1]
    d, dp2 = t["d"], t["dp2"]
    G, det_m, tr, det_fj = t["G"], t["det_m"], t["tr"], t["det_fj"]
    minv, einv, fj, fjt, minv_jt = t["minv"], t["einv"], t["fj"], t["fjt"], t["minv_jt"]
    m_pre = t["m_pre"]

    dGdJ = d * P_EXP * THETA * det_m * tr ** (dp2 - 1.0) * minv_jt  # :232
    dGddet = (
        P_EXP * (1.0 - 2.0 * THETA) * d**dp2 * det_m ** (1.0 - P_EXP)
        * det_fj ** (P_EXP - 1.0)
    )  # :233
    dGdM = (
        -0.5 * THETA * d * P_EXP * det_m * tr ** (dp2 - 1.0)
        * _mm(_mm(minv.T, fjt), _mm(fj, minv))
    ) + (
        0.5 * THETA * det_m * tr**dp2
        + (0.5 - THETA) * (1.0 - P_EXP) * d**dp2
        * det_m ** (1.0 - P_EXP) * det_fj**P_EXP
    ) * minv  # :234-236

    # basisComb = sum_j einv.row(j) * tr(dGdM (mPre_{j+1} - mPre_0)) (:239-244)
    dm = m_pre[1:] - m_pre[0]  # [D, D, D]
    # tr(dGdM @ dm_j) = sum_{m,n} dGdM[n, m] dm[j, m, n]
    traces = jnp.sum(dm * dGdM.T[None], axis=(-2, -1))
    basis_comb = jnp.sum(traces[:, None] * einv, axis=0)  # traces @ einv

    c1 = -G + dGddet * det_fj  # :246
    v_loc = c1 * einv + _mm(_mm(einv, dGdJ), fj)  # :247
    v_loc = v_loc - basis_comb[None, :] / (d + 1.0)  # :248-250

    grad_simplex = jnp.sum(v_loc, axis=0) + basis_comb  # :253-258 (dGdX = 0)
    grad = jnp.concatenate([grad_simplex[None, :], -v_loc], axis=0)  # :261-269
    grad = grad * t["abs_k"]  # :271

    ih = t["abs_k"] * G  # Igt (:274-276)
    if dxpu is not None:
        grad = grad + w * w * (z - dxpu)  # :281
    return ih, grad
