"""Component-form Pallas TPU kernel for the 2D prox z-update.

Round-2's Pallas prox kept the element math in matrix form and died on a
Mosaic layout rejection: ``infer-vector-layout: unsupported shape cast
vector<128x8x6xf32> -> vector<128x8x3x2xf32>`` at the ``reshape(D+1, D)``
inside the energy (COVERAGE.md "Prox backend decision"). This module is
the identified fix, written per that post-mortem and VERDICT r3 item 5:
**every tensor entry is its own (8, 128) vreg tile** — the element batch
lives on the (sublane, lane) axes, and all per-element 2x2 / 6-vector
algebra is explicit scalar arithmetic over those tiles. No reshapes, no
shape casts, no dynamic gathers inside the kernel (interpolation cells
are pre-gathered by the XLA-level cell-table fetch, exactly like the vmap
backend freezes them).

Scope (the headline 2D bench family): D=2, no computational mesh,
symmetric 16-wide cell table. Everything else keeps the vmap backend.

Per Newton iteration the kernel computes the ANALYTIC gradient
(hand-ported from ``ops.huang.element_energy_grad``, reference
``AdaptationFunctional.cpp:232-271``), the 6x6 Jacobian via 6 forward
``jax.jvp`` passes of that gradient (trace-time transform — emits only
elementwise ops), an unrolled LDL^T solve, and the vmap backend's
backtracking/acceptance rules (``ops.prox``: det-floor trial, _ALPHAS
schedule, retire on gnorm<tol after the first sweep, stall retire).
Difference from the vmap backend: the Jacobian is rebuilt every iteration
(VMEM-resident, so the rebuild is pure VPU work) instead of the
chord-carry — trajectories agree to solver tolerance, not bitwise.

Each grid step processes a (8, 128)-element tile; a ``pl.when`` guard
skips the whole Newton body once every element in the tile has retired,
recovering the vmap backend's early exit per tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_DET_FLOOR = 1e-30
_DIAG_FLOOR = 1e-12
_LEVENBERG = 1e-9
_ALPHAS_BT = (0.0625, 0.125, 0.25, 0.5, 1.0)  # small->large, like ops.prox

# cell row layout (monitor_grid.build_monitor_grid, symmetric 2D table):
# [v00(m00,m01,m11), v10(...), v01(...), v11(...), x0, x1, y0, y1]
_ROW_W = 16


def _sample_m(cell, x, y):
    """Bilinear monitor sample from one vertex's 16 cell-row tiles.
    cell: list of 16 arrays; returns (m00, m01, m11)."""
    x0, x1, y0, y1 = cell[12], cell[13], cell[14], cell[15]
    norm = 1.0 / ((x1 - x0) * (y1 - y0))
    c00 = norm * (x1 - x) * (y1 - y)
    c10 = norm * (x - x0) * (y1 - y)
    c01 = norm * (x1 - x) * (y - y0)
    c11 = norm * (x - x0) * (y - y0)

    def entry(k):
        return (c00 * cell[0 + k] + c10 * cell[3 + k]
                + c01 * cell[6 + k] + c11 * cell[9 + k])

    return entry(0), entry(1), entry(2)


def _common_c(z, cells, ehat):
    """Component-form port of huang._common_terms (2D, no comp mesh).
    z: list of 6 tiles (vertex-major: v0x, v0y, v1x, v1y, v2x, v2y);
    cells: list of 3 per-vertex 16-tile lists; ehat: 2x2 Python floats.
    Returns a dict of tiles."""
    m = [_sample_m(cells[v], z[2 * v], z[2 * v + 1]) for v in range(3)]
    ms00 = m[0][0] + m[1][0] + m[2][0]
    ms01 = m[0][1] + m[1][1] + m[2][1]
    ms11 = m[0][2] + m[1][2] + m[2][2]
    det_ms = ms00 * ms11 - ms01 * ms01
    # minv = inv(m_sum) / 3  (huang.py:147)
    q = 1.0 / (3.0 * det_ms)
    mi00 = ms11 * q
    mi01 = -ms01 * q
    mi11 = ms00 * q

    # E columns are edges v1-v0, v2-v0 (huang.py:149)
    e00 = z[2] - z[0]
    e10 = z[3] - z[1]
    e01 = z[4] - z[0]
    e11 = z[5] - z[1]
    edet = e00 * e11 - e01 * e10
    r = 1.0 / edet
    ei00 = e11 * r
    ei01 = -e01 * r
    ei10 = -e10 * r
    ei11 = e00 * r

    h00, h01, h10, h11 = ehat
    fj00 = h00 * ei00 + h01 * ei10
    fj01 = h00 * ei01 + h01 * ei11
    fj10 = h10 * ei00 + h11 * ei10
    fj11 = h10 * ei01 + h11 * ei11
    det_fj = fj00 * fj11 - fj01 * fj10

    # minv_jt = minv @ fj^T (minv symmetric)
    mj00 = mi00 * fj00 + mi01 * fj01  # [0,0]: row0 . fj row0
    mj01 = mi00 * fj10 + mi01 * fj11  # [0,1]: row0 . fj row1
    mj10 = mi01 * fj00 + mi11 * fj01
    mj11 = mi01 * fj10 + mi11 * fj11
    # tr(FJ Minv FJ^T) = sum_ij fj[i,j] * minv_jt[j,i]
    tr = fj00 * mj00 + fj01 * mj10 + fj10 * mj01 + fj11 * mj11

    det_minv = mi00 * mi11 - mi01 * mi01
    det_m = jnp.sqrt(1.0 / jnp.maximum(det_minv, _DET_FLOOR))
    tr_c = jnp.maximum(tr, _DET_FLOOR)
    det_fj_c = jnp.maximum(det_fj, _DET_FLOOR)

    # G with D=2, p=1.5, theta=1/3: dp2 = 1.5, (1-2theta)=1/3, d^dp2=2^1.5
    sqrt_tr = jnp.sqrt(tr_c)
    tr32 = tr_c * sqrt_tr
    sqrt_dfj = jnp.sqrt(det_fj_c)
    dfj32 = det_fj_c * sqrt_dfj
    inv_sqrt_dm = 1.0 / jnp.sqrt(det_m)
    third = 1.0 / 3.0
    c_d32 = 2.0 * jnp.sqrt(jnp.asarray(2.0, z[0].dtype))  # 2^1.5
    G = third * det_m * tr32 + third * c_d32 * dfj32 * inv_sqrt_dm
    abs_k = jnp.abs(edet * 0.5)

    return dict(
        m=m, mi00=mi00, mi01=mi01, mi11=mi11,
        ei00=ei00, ei01=ei01, ei10=ei10, ei11=ei11,
        fj00=fj00, fj01=fj01, fj10=fj10, fj11=fj11,
        mj00=mj00, mj01=mj01, mj10=mj10, mj11=mj11,
        tr=tr_c, det_m=det_m, det_fj=det_fj_c, G=G, abs_k=abs_k,
        sqrt_tr=sqrt_tr, sqrt_dfj=sqrt_dfj, inv_sqrt_dm=inv_sqrt_dm,
        edet=edet,
    )


def energy_c(z, cells, ehat, dxpu=None, w=None):
    """(ih_unregularized, e_regularized) — component form of
    huang.element_energy."""
    t = _common_c(z, cells, ehat)
    ih = t["abs_k"] * t["G"]
    if dxpu is None:
        return ih, ih
    reg = sum((dxpu[i] - z[i]) ** 2 for i in range(6))
    return ih, ih + (0.5 * w * w) * reg


def grad_c(z, cells, ehat, dxpu, w, free):
    """(grads list[6], ih_unreg, e_reg) — component form of
    huang.element_energy_grad (AdaptationFunctional.cpp:232-271)."""
    t = _common_c(z, cells, ehat)
    G, det_m, tr, det_fj = t["G"], t["det_m"], t["tr"], t["det_fj"]
    sqrt_tr, sqrt_dfj = t["sqrt_tr"], t["sqrt_dfj"]
    mi00, mi01, mi11 = t["mi00"], t["mi01"], t["mi11"]
    ei = (t["ei00"], t["ei01"], t["ei10"], t["ei11"])
    fj00, fj01, fj10, fj11 = t["fj00"], t["fj01"], t["fj10"], t["fj11"]
    mj00, mj01, mj10, mj11 = t["mj00"], t["mj01"], t["mj10"], t["mj11"]
    third = 1.0 / 3.0
    c_d32 = 2.0 * jnp.sqrt(jnp.asarray(2.0, z[0].dtype))  # 2^1.5

    # dGdJ = d p theta det_m tr^(dp2-1) * minv_jt ; d p theta = 1 (2*1.5/3)
    s_j = det_m * sqrt_tr
    dj00 = s_j * mj00
    dj01 = s_j * mj01
    dj10 = s_j * mj10
    dj11 = s_j * mj11
    # dGddet = p (1-2theta) d^dp2 det_m^(1-p) det_fj^(p-1)
    dgddet = 1.5 * third * c_d32 * t["inv_sqrt_dm"] * sqrt_dfj

    # dGdM = -0.5 theta d p det_m tr^(dp2-1) (minv^T fj^T fj minv)
    #        + [0.5 theta det_m tr^dp2
    #           + (0.5-theta)(1-p) d^dp2 det_m^(1-p) det_fj^p] * minv
    # A = fj minv (minv symmetric): a[i][k] = sum_j fj[i,j] minv[j,k]
    a00 = fj00 * mi00 + fj01 * mi01
    a01 = fj00 * mi01 + fj01 * mi11
    a10 = fj10 * mi00 + fj11 * mi01
    a11 = fj10 * mi01 + fj11 * mi11
    # B = (fj minv)^T (fj minv) = A^T A (symmetric): this equals
    # minv^T fj^T fj minv
    b00 = a00 * a00 + a10 * a10
    b01 = a00 * a01 + a10 * a11
    b11 = a01 * a01 + a11 * a11
    s_m1 = -0.5 * s_j  # -0.5 theta d p det_m tr^0.5
    tr32 = tr * sqrt_tr
    dfj32 = det_fj * sqrt_dfj
    s_m2 = (0.5 * third) * det_m * tr32 + (
        (0.5 - third) * (1.0 - 1.5) * c_d32 * t["inv_sqrt_dm"] * dfj32
    )
    dm00 = s_m1 * b00 + s_m2 * mi00
    dm01 = s_m1 * b01 + s_m2 * mi01
    dm11 = s_m1 * b11 + s_m2 * mi11  # dGdM symmetric here (B, minv sym)

    # basisComb_j = sum over rows: traces_j * einv row j, with
    # traces_j = tr(dGdM @ (m_{j+1} - m_0)) = sum_{m,n} dm_j[m,n] dGdM[n,m]
    m = t["m"]
    d1 = (m[1][0] - m[0][0], m[1][1] - m[0][1], m[1][2] - m[0][2])
    d2 = (m[2][0] - m[0][0], m[2][1] - m[0][1], m[2][2] - m[0][2])
    tr1 = d1[0] * dm00 + 2.0 * d1[1] * dm01 + d1[2] * dm11
    tr2 = d2[0] * dm00 + 2.0 * d2[1] * dm01 + d2[2] * dm11
    ei00, ei01, ei10, ei11 = ei
    bc0 = tr1 * ei00 + tr2 * ei10
    bc1 = tr1 * ei01 + tr2 * ei11

    c1 = -G + dgddet * det_fj
    # C = einv dGdJ: c[i][k] = sum_j einv[i,j] dGdJ[j,k]
    q00 = ei00 * dj00 + ei01 * dj10
    q01 = ei00 * dj01 + ei01 * dj11
    q10 = ei10 * dj00 + ei11 * dj10
    q11 = ei10 * dj01 + ei11 * dj11
    # v_loc = c1 einv + C fj - basis_comb/3  (rows j = 0, 1)
    v00 = c1 * ei00 + q00 * fj00 + q01 * fj10 - bc0 * third
    v01 = c1 * ei01 + q00 * fj01 + q01 * fj11 - bc1 * third
    v10 = c1 * ei10 + q10 * fj00 + q11 * fj10 - bc0 * third
    v11 = c1 * ei11 + q10 * fj01 + q11 * fj11 - bc1 * third

    g0x = v00 + v10 + bc0  # vertex 0 = sum v_loc + basis_comb
    g0y = v01 + v11 + bc1
    abs_k = t["abs_k"]
    grads = [
        g0x * abs_k, g0y * abs_k,
        -v00 * abs_k, -v01 * abs_k,
        -v10 * abs_k, -v11 * abs_k,
    ]
    ih = abs_k * G
    w2 = w * w
    reg = sum((dxpu[i] - z[i]) ** 2 for i in range(6))
    e_reg = ih + 0.5 * w2 * reg
    grads = [(grads[i] + w2 * (z[i] - dxpu[i])) * free[i] for i in range(6)]
    return grads, ih, e_reg


def hess_c(z, cells, ehat, dxpu, w, free):
    """6x6 Jacobian of grad_c via 6 forward jvp passes (the vmap backend's
    jacfwd, emitted as pure elementwise ops). Fixed coords (free=0) get
    identity rows/cols + Levenberg, like ops.prox.masked_jac."""
    one = jnp.ones_like(z[0])
    zero = jnp.zeros_like(z[0])
    H = [[None] * 6 for _ in range(6)]
    for j in range(6):
        tangent = [one if i == j else zero for i in range(6)]
        _, dgrads = jax.jvp(
            lambda zz: grad_c(zz, cells, ehat, dxpu, w, free)[0],
            (z,), (tangent,),
        )
        for i in range(6):
            H[i][j] = dgrads[i]
    # mask fixed coords: H' = F H F + (I - F) + Levenberg I
    for i in range(6):
        for j in range(6):
            h = H[i][j] * free[i] * free[j]
            if i == j:
                h = h + (1.0 - free[i]) + _LEVENBERG
            H[i][j] = h
    return H


def ldlt_c(H, b):
    """Unrolled n x n LDL^T solve on component tiles (port of
    ops.linalg.ldlt_solve with list-of-tiles storage; n = len(b) — 6 in
    2D, 12 in 3D)."""
    n = len(b)
    floor = jnp.asarray(_DIAG_FLOOR, b[0].dtype)
    L = [[None] * n for _ in range(n)]
    D = [None] * n
    for j in range(n):
        d = H[j][j]
        for k in range(j):
            d = d - L[j][k] * L[j][k] * D[k]
        d = jnp.where(jnp.abs(d) < floor, floor, d)
        D[j] = d
        for i in range(j + 1, n):
            s = H[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k] * D[k]
            L[i][j] = s / d
    zv = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * zv[k]
        zv[i] = s
    y = [zv[i] / D[i] for i in range(n)]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s
    return x


def _edet_c(z):
    return (z[2] - z[0]) * (z[5] - z[1]) - (z[4] - z[0]) * (z[3] - z[1])


def make_newton_sweeps(n, energy_full, grad_full, hess_full, edet_fn,
                       w, tol):
    """Dimension-generic prox Newton sweep on component tiles
    (n = D(D+1): 6 in 2D, 12 in 3D). Pure tile functions:
    ``energy_full(z) -> (ih_unreg, e_reg)``, ``grad_full(z) ->
    (grads, ih, e_reg)``, ``hess_full(z) -> H`` (n x n list-of-lists),
    ``edet_fn(z)`` element-orientation determinant. Returns
    ``one_iter(not_first, zc, active)``."""

    def solve_dir(zc):
        g, _, e0 = grad_full(zc)
        gnorm = sum(jnp.abs(g[i]) for i in range(n))
        H = hess_full(zc)
        p = ldlt_c(H, [-g[i] for i in range(n)])
        # finite fallback: damped gradient (ops.prox.solve_dir semantics)
        finite = functools.reduce(
            jnp.logical_and, [jnp.isfinite(p[i]) for i in range(n)]
        )
        inv_w2 = 1.0 / (w * w)
        p = [jnp.where(finite, p[i], -g[i] * inv_w2) for i in range(n)]
        return p, gnorm, e0

    def trial_ok(zt, e0, det_floor):
        _, e_a = energy_full(zt)
        return jnp.logical_and(
            jnp.logical_and(jnp.isfinite(e_a), e_a <= e0),
            edet_fn(zt) > det_floor,
        )

    def one_iter(not_first, zc, active):
        """``not_first``: bool scalar — True from the second sweep on
        (kernel derives it from an f32 carry; int comparisons and
        bool->float casts trip a Mosaic convert-lowering recursion)."""
        p, gnorm, e0 = solve_dir(zc)
        det0 = edet_fn(zc)
        det_floor = jnp.minimum(det0, jnp.zeros_like(det0))
        # backtracking: pick the largest accepted alpha (0 if none)
        alpha = jnp.zeros_like(zc[0])
        for a in _ALPHAS_BT:
            zt = [zc[i] + a * p[i] for i in range(n)]
            ok = trial_ok(zt, e0, det_floor)
            alpha = jnp.where(ok, jnp.asarray(a, zc[0].dtype), alpha)
        step_inf = alpha * functools.reduce(
            jnp.maximum, [jnp.abs(p[i]) for i in range(n)]
        )
        zmax = functools.reduce(
            jnp.maximum, [jnp.abs(zc[i]) for i in range(n)]
        )
        eps = 10.0 * jnp.finfo(zc[0].dtype).eps
        stalled = step_inf <= eps * (1.0 + zmax)
        # retire rules (ops.prox.body): gnorm < tol only after the first
        # sweep; stall retire after the move
        retire = jnp.logical_and(gnorm < tol, not_first)
        active_now = jnp.logical_and(active, ~retire)
        z_new = [
            jnp.where(active_now, zc[i] + alpha * p[i], zc[i])
            for i in range(n)
        ]
        active_next = jnp.logical_and(active_now, ~stalled)
        return z_new, active_next

    return one_iter


def make_chord_sweeps(n, energy_full, grad_full, hess_full, edet_fn,
                      w, tol, h_read, h_write, pl_when):
    """CHORD variant of :func:`make_newton_sweeps` — the vmap backend's
    policy (``ops.prox.batched_iter``) on component tiles: the Hessian
    lives in VMEM scratch across sweeps; every sweep tries the cheap
    chord step first (one gradient + one LDL^T solve + ONE trial
    energy), and only lanes that REJECT it pay a refresh (full
    ``hess_full`` + re-solve + backtracking), executed under ``pl_when``
    so a tile of all-accepting lanes skips it entirely. This is what
    makes weakly-regularized configs (rho=10, the 3DMonitor3 CompMesh
    family) cheap: elements stay active for many sweeps there, and the
    exact-Newton kernel paid the full Hessian each time (VERDICT r4
    item 4 — the kernel measured SLOWER than vmap on 3DMonitor320).

    ``h_read() -> H`` (lower-triangular list-of-lists of tiles),
    ``h_write(H, keep_mask)`` merges new entries per lane (keep_mask
    True keeps the CACHED entry). ``pl_when`` is ``pl.when`` from the
    calling kernel (this module stays import-light).

    Returns ``(init_h(zc), one_iter(not_first, zc, active))``.
    """

    def init_h(zc):
        h_write(hess_full(zc), None)

    def _solve(H, g):
        p = ldlt_c(H, [-g[i] for i in range(n)])
        finite = functools.reduce(
            jnp.logical_and, [jnp.isfinite(p[i]) for i in range(n)]
        )
        inv_w2 = 1.0 / (w * w)
        return [jnp.where(finite, p[i], -g[i] * inv_w2) for i in range(n)]

    def trial_ok(zt, e0, det_floor):
        _, e_a = energy_full(zt)
        return jnp.logical_and(
            jnp.logical_and(jnp.isfinite(e_a), e_a <= e0),
            edet_fn(zt) > det_floor,
        )

    def one_iter(not_first, zc, active, pscr):
        g, _, e0 = grad_full(zc)
        gnorm = sum(jnp.abs(g[i]) for i in range(n))
        det0 = edet_fn(zc)
        det_floor = jnp.minimum(det0, jnp.zeros_like(det0))
        p = _solve(h_read(), g)
        zt = [zc[i] + p[i] for i in range(n)]
        ok1 = trial_ok(zt, e0, det_floor)
        for i in range(n):
            pscr[i] = jnp.where(ok1, p[i], jnp.zeros_like(p[i]))
        need = jnp.where(
            jnp.logical_and(active, ~ok1),
            jnp.ones_like(zc[0]), jnp.zeros_like(zc[0]),
        )

        @pl_when(jnp.max(need) > 0.5)
        def _refresh():
            H2 = hess_full(zc)
            h_write(H2, ok1)
            p2 = _solve(H2, g)
            alpha = jnp.zeros_like(zc[0])
            for a in _ALPHAS_BT:
                zt2 = [zc[i] + a * p2[i] for i in range(n)]
                ok = trial_ok(zt2, e0, det_floor)
                alpha = jnp.where(ok, jnp.asarray(a, zc[0].dtype), alpha)
            for i in range(n):
                pscr[i] = jnp.where(ok1, pscr[i], alpha * p2[i])

        step = [pscr[i] for i in range(n)]
        step_inf = functools.reduce(
            jnp.maximum, [jnp.abs(step[i]) for i in range(n)]
        )
        zmax = functools.reduce(
            jnp.maximum, [jnp.abs(zc[i]) for i in range(n)]
        )
        eps = 10.0 * jnp.finfo(zc[0].dtype).eps
        stalled = step_inf <= eps * (1.0 + zmax)
        retire = jnp.logical_and(gnorm < tol, not_first)
        active_now = jnp.logical_and(active, ~retire)
        z_new = [
            jnp.where(active_now, zc[i] + step[i], zc[i])
            for i in range(n)
        ]
        active_next = jnp.logical_and(active_now, ~stalled)
        return z_new, active_next

    return init_h, one_iter


def newton_sweeps_c(z, cells, ehat, dxpu, w, free, tol, max_iters,
                    when=None):
    """2D instantiation of :func:`make_newton_sweeps` (kept as the
    kernel-facing API). Returns (ih0, one_iter)."""
    del max_iters, when  # loop control lives in the kernel
    ih0, _ = energy_c(z, cells, ehat)
    one_iter = make_newton_sweeps(
        6,
        lambda zz: energy_c(zz, cells, ehat, dxpu, w),
        lambda zz: grad_c(zz, cells, ehat, dxpu, w, free),
        lambda zz: hess_c(zz, cells, ehat, dxpu, w, free),
        _edet_c,
        w, tol,
    )
    return ih0, one_iter


# --- Pallas kernel + host wrapper ----------------------------------------

_TILE = 8 * 128  # elements per grid step: one (8, 128) vreg per component


def make_be_kernels2d(ehat_const, *, interpret: bool = False):
    """Backward-Euler hot-op kernels on tiled channel-major input — the
    per-element energy gradient and Hessian evaluated VMEM-resident, the
    way the prox kernel runs its Newton sweeps. Both are UNREGULARIZED
    (w=0, free=1): BE's F(x) = (dt/tau) grad I + (x - x^n) masks at the
    NODE level (interior), not per element, and its Jacobian blocks are
    the raw energy Hessians (``elem_hess``; the 1e-9 Levenberg floor
    hess_c adds is ~1e-3x the Jacobi-Richardson tolerance). Replaces the
    XLA jacfwd build — the single most expensive op in the BE step.

    Returns ``(eg, hess)``:
      eg(z_t [6,T,8,128], cells_t [48,T,8,128]) -> (g [6,T,8,128],
                                                     ih [T,8,128])
      hess(z_t, cells_t) -> H lower-triangular [21, T, 8, 128]
      (channel t(i,j) = i(i+1)/2 + j for i >= j).
    """
    import sys

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if sys.getrecursionlimit() < 20000:
        sys.setrecursionlimit(20000)

    eh = np.asarray(ehat_const, dtype=np.float64).reshape(-1)
    ehat = (float(eh[0]), float(eh[1]), float(eh[2]), float(eh[3]))
    tri = [(i, j) for i in range(6) for j in range(i + 1)]

    def eg_kernel(z_ref, cells_ref, g_ref, ih_ref):
        z = [z_ref[c, 0] for c in range(6)]
        cells = [
            [cells_ref[v * _ROW_W + k, 0] for k in range(_ROW_W)]
            for v in range(3)
        ]
        zero = jnp.zeros_like(z[0])
        one = jnp.ones_like(z[0])
        g, ih, _ = grad_c(z, cells, ehat, [zero] * 6, 0.0, [one] * 6)
        for c in range(6):
            g_ref[c, 0] = g[c]
        ih_ref[0] = ih

    def hess_kernel(z_ref, cells_ref, h_ref):
        z = [z_ref[c, 0] for c in range(6)]
        cells = [
            [cells_ref[v * _ROW_W + k, 0] for k in range(_ROW_W)]
            for v in range(3)
        ]
        zero = jnp.zeros_like(z[0])
        one = jnp.ones_like(z[0])
        H = hess_c(z, cells, ehat, [zero] * 6, 0.0, [one] * 6)
        for t, (i, j) in enumerate(tri):
            h_ref[t, 0] = H[i][j]

    cache: dict = {}

    def _spec(n):
        return pl.BlockSpec(
            (n, 1, 8, 128), lambda i: (i * 0, i, i * 0, i * 0),
            memory_space=pltpu.VMEM,
        )

    def _get(kind, T, dtype):
        key = (kind, int(T), jnp.dtype(dtype).name)
        if key not in cache:
            spec1 = pl.BlockSpec(
                (1, 8, 128), lambda i: (i, i * 0, i * 0),
                memory_space=pltpu.VMEM,
            )
            if kind == "eg":
                cache[key] = pl.pallas_call(
                    eg_kernel, grid=(T,),
                    in_specs=[_spec(6), _spec(48)],
                    out_specs=(_spec(6), spec1),
                    out_shape=(
                        jax.ShapeDtypeStruct((6, T, 8, 128), dtype),
                        jax.ShapeDtypeStruct((T, 8, 128), dtype),
                    ),
                    interpret=interpret,
                )
            else:
                cache[key] = pl.pallas_call(
                    hess_kernel, grid=(T,),
                    in_specs=[_spec(6), _spec(48)],
                    out_specs=_spec(21),
                    out_shape=jax.ShapeDtypeStruct(
                        (21, T, 8, 128), dtype
                    ),
                    interpret=interpret,
                )
        return cache[key]

    def eg(z_t, cells_t):
        return _get("eg", z_t.shape[1], z_t.dtype)(z_t, cells_t)

    def hess(z_t, cells_t):
        return _get("hess", z_t.shape[1], z_t.dtype)(z_t, cells_t)

    return eg, hess


def make_prox_pallas2d(ehat_const, w: float, *, interpret: bool = False):
    """Build ``prox(grid, z, xi, dxpu, free_mask, tol, max_iters,
    J_state=None)`` with the vmap backend's signature, backed by the
    component-form Pallas kernel. 2D, no comp mesh, symmetric cell table.

    ``tol``/``max_iters`` must be static Python numbers (they are in every
    integrator call site). ``J_state`` is passed through untouched — the
    kernel rebuilds its Jacobian in VMEM each iteration, so pair this
    backend with ``j_carry=False``.
    """
    import sys

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .monitor_grid import _cell_index

    # the traced kernel graph is deep (6 jvp passes of the hand-written
    # gradient x unrolled LDLT x 5 backtracking trials per Newton sweep);
    # Mosaic lowering walks it recursively and trips CPython's default
    # 1000-frame limit
    if sys.getrecursionlimit() < 20000:
        sys.setrecursionlimit(20000)

    eh = np.asarray(ehat_const, dtype=np.float64).reshape(-1)
    ehat = (float(eh[0]), float(eh[1]), float(eh[2]), float(eh[3]))
    w = float(w)

    def _make_kernel(tol: float, max_iters: int):
        def kernel(z_ref, dxpu_ref, free_ref, cells_ref, zout_ref,
                   ih0_ref, zscr, ascr):
            z = [z_ref[c, 0] for c in range(6)]
            dxpu = [dxpu_ref[c, 0] for c in range(6)]
            free = [free_ref[c, 0] for c in range(6)]
            cells = [
                [cells_ref[v * _ROW_W + k, 0] for k in range(_ROW_W)]
                for v in range(3)
            ]
            tol_t = jnp.asarray(tol, z[0].dtype)

            ih0, one_iter = newton_sweeps_c(
                z, cells, ehat, dxpu, w, free, tol_t, max_iters
            )
            ih0_ref[0] = ih0
            for c in range(6):
                zscr[c] = z[c]
            ascr[:] = jnp.ones_like(z[0])

            ones_t = jnp.ones_like(z[0])
            zeros_t = jnp.zeros_like(z[0])

            def body(_it, not_first_f):
                # tile-level early exit: once every element in this
                # (8,128) tile retired, the guard skips the whole sweep
                @pl.when(jnp.max(ascr[:]) > 0.5)
                def _():
                    zc = [zscr[c] for c in range(6)]
                    active = ascr[:] > 0.5
                    z_new, a_new = one_iter(
                        not_first_f > 0.5, zc, active
                    )
                    for c in range(6):
                        zscr[c] = z_new[c]
                    # select, not astype: bool->float converts trip a
                    # Mosaic lowering recursion
                    ascr[:] = jnp.where(a_new, ones_t, zeros_t)

                # f32 "past the first sweep" carry (no int arithmetic)
                return jnp.ones((), z[0].dtype)

            jax.lax.fori_loop(
                0, max_iters, body, jnp.zeros((), z[0].dtype)
            )
            for c in range(6):
                zout_ref[c, 0] = zscr[c]

        return kernel

    call_cache: dict = {}

    def _get_call(tol, max_iters, T, dtype):
        key = (float(tol), int(max_iters), int(T), jnp.dtype(dtype).name)
        if key not in call_cache:
            # index maps: zeros derived from i (i*0) so every returned
            # index is i32 — bare literal 0s are weak-i64 under x64 and
            # Mosaic cannot legalize the resulting mixed func.return
            spec6 = pl.BlockSpec(
                (6, 1, 8, 128), lambda i: (i * 0, i, i * 0, i * 0),
                memory_space=pltpu.VMEM,
            )
            spec48 = pl.BlockSpec(
                (48, 1, 8, 128), lambda i: (i * 0, i, i * 0, i * 0),
                memory_space=pltpu.VMEM,
            )
            spec1 = pl.BlockSpec(
                (1, 8, 128), lambda i: (i, i * 0, i * 0),
                memory_space=pltpu.VMEM,
            )
            call_cache[key] = pl.pallas_call(
                _make_kernel(float(tol), int(max_iters)),
                grid=(T,),
                in_specs=[spec6, spec6, spec6, spec48],
                out_specs=(spec6, spec1),
                out_shape=(
                    jax.ShapeDtypeStruct((6, T, 8, 128), dtype),
                    jax.ShapeDtypeStruct((T, 8, 128), dtype),
                ),
                scratch_shapes=[
                    pltpu.VMEM((6, 8, 128), dtype),
                    pltpu.VMEM((8, 128), dtype),
                ],
                interpret=interpret,
            )
        return call_cache[key]

    def _to_tiles(a2d, nfp):
        """[NF, C] -> [C, T, 8, 128] (pad rows with element 0's data)."""
        nf, c = a2d.shape
        pad = nfp - nf
        if pad:
            a2d = jnp.concatenate(
                [a2d, jnp.broadcast_to(a2d[:1], (pad, c))]
            )
        return a2d.T.reshape(c, nfp // _TILE, 8, 128)

    def prox(grid, z, xi, dxpu, free_mask, tol, max_iters, J_state=None):
        nf = z.shape[0]
        T = -(-nf // _TILE)
        nfp = T * _TILE

        ax, ay = grid.axes
        nx = ax.shape[0] - 1
        xi_i = _cell_index(z[..., 0], ax)  # [NF, 3]
        yi_i = _cell_index(z[..., 1], ay)
        rows = grid.cell_table[(yi_i * nx + xi_i).reshape(-1)]
        cells_t = _to_tiles(rows.reshape(nf, 3 * _ROW_W), nfp)

        z_t = _to_tiles(z.reshape(nf, 6), nfp)
        dxpu_t = _to_tiles(dxpu.reshape(nf, 6), nfp)
        free_t = _to_tiles(free_mask.reshape(nf, 6), nfp)

        zo, ih0 = _get_call(tol, max_iters, T, z.dtype)(
            z_t, dxpu_t, free_t, cells_t
        )
        z_opt = zo.reshape(6, nfp).T[:nf].reshape(nf, 3, 2)
        ih0 = ih0.reshape(nfp)[:nf]
        if J_state is None:
            return z_opt, ih0
        return z_opt, ih0, J_state[0]

    def tiled_call(z_t, dxpu_t, free_t, cells_t, tol, max_iters):
        """Direct kernel entry on ALREADY-TILED channel-major inputs —
        used by the structured-grid engine (integrators/admm_grid2d.py),
        which builds tiles by stencil slicing instead of gathers.
        z_t/dxpu_t/free_t: [6, T, 8, 128]; cells_t: [48, T, 8, 128]
        (three 16-wide per-vertex cell rows, vertex-major). Returns
        (z_t' [6, T, 8, 128], ih0_t [T, 8, 128])."""
        T = z_t.shape[1]
        return _get_call(tol, max_iters, T, z_t.dtype)(
            z_t, dxpu_t, free_t, cells_t
        )

    prox.tiled_call = tiled_call
    prox.TILE = _TILE
    prox.ROW_W = _ROW_W
    return prox
