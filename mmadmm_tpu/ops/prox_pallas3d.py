"""Component-form Pallas TPU kernel for the 3D prox z-update.

The 3D instantiation of the design proven in 2D (``prox_pallas2d.py``,
measured 4.5x on-chip): every 3x3 tensor entry its own (8, 128) vreg,
the tet batch on the (sublane, lane) axes, no shape casts, no gathers in
the kernel. Per Newton sweep: the ANALYTIC Huang gradient (hand-ported
from ``ops.huang.element_energy_grad`` at D=3, reference
``AdaptationFunctional.cpp:232-271``), the 12x12 Jacobian via 12 forward
``jax.jvp`` passes, an unrolled 12x12 LDL^T, and the vmap backend's
backtracking/retire rules (shared ``make_newton_sweeps``).

Scope: D=3, no computational mesh, symmetric monitor (the 48-wide cell
table) or a constant grid (broadcast corners). Cell data is pre-fetched
at the XLA level into a 54-wide per-vertex row: 8 corners x 6 symmetric
entries + the 6 cell bounds.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .prox_pallas2d import _DET_FLOOR, ldlt_c, make_newton_sweeps

_ROW_W3 = 54  # 48 corner entries + x0,x1,y0,y1,z0,z1
_SYM_W = (1.0, 2.0, 2.0, 1.0, 2.0, 1.0)  # contraction weights, sym pairs


def _sym_to_full(s):
    """(s00,s01,s02,s11,s12,s22) -> row-major 9-list."""
    return [s[0], s[1], s[2], s[1], s[3], s[4], s[2], s[4], s[5]]


def _mm33(A, B):
    """Row-major 9-list matmul."""
    return [
        sum(A[i * 3 + k] * B[k * 3 + j] for k in range(3))
        for i in range(3) for j in range(3)
    ]


def _det33(A):
    return (
        A[0] * (A[4] * A[8] - A[5] * A[7])
        - A[1] * (A[3] * A[8] - A[5] * A[6])
        + A[2] * (A[3] * A[7] - A[4] * A[6])
    )


def _inv33(A, det):
    """Adjugate/det, entries matching huang._inv's cofactor layout."""
    r = 1.0 / det
    return [
        (A[4] * A[8] - A[5] * A[7]) * r,
        (A[2] * A[7] - A[1] * A[8]) * r,
        (A[1] * A[5] - A[2] * A[4]) * r,
        (A[5] * A[6] - A[3] * A[8]) * r,
        (A[0] * A[8] - A[2] * A[6]) * r,
        (A[2] * A[3] - A[0] * A[5]) * r,
        (A[3] * A[7] - A[4] * A[6]) * r,
        (A[1] * A[6] - A[0] * A[7]) * r,
        (A[0] * A[4] - A[1] * A[3]) * r,
    ]


def _sample_m3(cell, x, y, z):
    """Trilinear monitor sample from one vertex's 54 cell-row tiles:
    returns the 6 symmetric entries (00,01,02,11,12,22). Corner order and
    weights match monitor_grid.sample_frozen bit-for-bit in expression
    shape."""
    x0, x1 = cell[48], cell[49]
    y0, y1 = cell[50], cell[51]
    z0, z1 = cell[52], cell[53]
    xd = (x - x0) / (x1 - x0)
    yd = (y - y0) / (y1 - y0)
    zd = (z - z0) / (z1 - z0)
    wts = [
        (1 - xd) * (1 - yd) * (1 - zd), xd * (1 - yd) * (1 - zd),
        (1 - xd) * yd * (1 - zd), xd * yd * (1 - zd),
        (1 - xd) * (1 - yd) * zd, xd * (1 - yd) * zd,
        (1 - xd) * yd * zd, xd * yd * zd,
    ]
    return [
        sum(wts[c] * cell[c * 6 + e] for c in range(8)) for e in range(6)
    ]


# d = 3, p = 3/2, theta = 1/3 constants (AdaptationFunctional.cpp:210-220)
_D_DP2 = 3.0 ** 2.25  # d^(d*p/2)
_THIRD = 1.0 / 3.0


def _q225(t):
    """t^2.25 as t*t*(t^0.25) — no transcendental pow."""
    return t * t * jnp.sqrt(jnp.sqrt(t))


def _q125(t):
    """t^1.25."""
    return t * jnp.sqrt(jnp.sqrt(t))


def _common_c3(z, cells, ehat):
    """Component-form port of huang._common_terms at D=3 (no comp mesh).
    z: 12 tiles (v*3+d); cells: 4 per-vertex 54-tile lists; ehat: 9
    Python floats row-major."""
    m = [
        _sample_m3(cells[v], z[3 * v], z[3 * v + 1], z[3 * v + 2])
        for v in range(4)
    ]
    ms = [m[0][e] + m[1][e] + m[2][e] + m[3][e] for e in range(6)]
    ms_full = _sym_to_full(ms)
    det_ms = _det33(ms_full)
    # minv = inv(m_sum) / (D+1)  (huang.py:147)
    mi = [v * 0.25 for v in _inv33(ms_full, det_ms)]

    # E columns are edges v_{j+1} - v_0: E[d][j]
    E = [z[3 * (j + 1) + d] - z[d] for d in range(3) for j in range(3)]
    edet = _det33(E)
    ei = _inv33(E, edet)
    fj = _mm33(ehat, ei)
    det_fj = _det33(fj)

    # minv_jt = minv @ fj^T; tr = sum_ij fj[i,j] * minv_jt[j,i]
    mj = [
        sum(mi[a * 3 + k] * fj[b * 3 + k] for k in range(3))
        for a in range(3) for b in range(3)
    ]
    tr = sum(fj[i * 3 + j] * mj[j * 3 + i]
             for i in range(3) for j in range(3))

    det_minv = _det33(mi)
    det_m = jnp.sqrt(1.0 / jnp.maximum(det_minv, _DET_FLOOR))
    tr_c = jnp.maximum(tr, _DET_FLOOR)
    det_fj_c = jnp.maximum(det_fj, _DET_FLOOR)

    inv_sqrt_dm = 1.0 / jnp.sqrt(det_m)
    sqrt_dfj = jnp.sqrt(det_fj_c)
    dfj32 = det_fj_c * sqrt_dfj
    G = _THIRD * det_m * _q225(tr_c) + _THIRD * _D_DP2 * dfj32 * inv_sqrt_dm
    abs_k = jnp.abs(edet / 6.0)
    return dict(
        m=m, mi=mi, ei=ei, fj=fj, mj=mj,
        tr=tr_c, det_m=det_m, det_fj=det_fj_c, G=G, abs_k=abs_k,
        inv_sqrt_dm=inv_sqrt_dm, sqrt_dfj=sqrt_dfj, dfj32=dfj32,
        edet=edet,
    )


def energy_c3(z, cells, ehat, dxpu=None, w=None):
    t = _common_c3(z, cells, ehat)
    ih = t["abs_k"] * t["G"]
    if dxpu is None:
        return ih, ih
    reg = sum((dxpu[i] - z[i]) ** 2 for i in range(12))
    return ih, ih + (0.5 * w * w) * reg


def grad_c3(z, cells, ehat, dxpu, w, free):
    """(grads list[12], ih_unreg, e_reg) — component form of the D=3
    analytic gradient."""
    t = _common_c3(z, cells, ehat)
    G, det_m, tr, det_fj = t["G"], t["det_m"], t["tr"], t["det_fj"]
    mi, ei, fj, mj = t["mi"], t["ei"], t["fj"], t["mj"]

    # dGdJ = d p theta det_m tr^(dp2-1) minv_jt ; d p theta = 1.5
    s_j = 1.5 * det_m * _q125(tr)
    dj = [s_j * v for v in mj]
    # dGddet = p (1-2theta) d^dp2 det_m^(1-p) det_fj^(p-1)
    dgddet = 1.5 * _THIRD * _D_DP2 * t["inv_sqrt_dm"] * t["sqrt_dfj"]

    # B = (fj minv)^T (fj minv); A = fj @ minv (minv symmetric full = mi)
    A = _mm33(fj, mi)
    B = [
        sum(A[k * 3 + i] * A[k * 3 + j] for k in range(3))
        for i in range(3) for j in range(3)
    ]
    s_m1 = -0.5 * s_j
    s_m2 = (0.5 * _THIRD) * det_m * _q225(tr) + (
        (0.5 - _THIRD) * (1.0 - 1.5) * _D_DP2
        * t["inv_sqrt_dm"] * t["dfj32"]
    )
    dgdm = [s_m1 * B[i] + s_m2 * mi[i] for i in range(9)]

    # traces_j = sum_{m,n} (m_{j+1} - m_0)[m,n] dGdM[n,m]; both symmetric
    dgdm_sym = [dgdm[0], dgdm[1], dgdm[2], dgdm[4], dgdm[5], dgdm[8]]
    traces = []
    for j in range(3):
        dm = [t["m"][j + 1][e] - t["m"][0][e] for e in range(6)]
        traces.append(
            sum(_SYM_W[e] * dm[e] * dgdm_sym[e] for e in range(6))
        )
    bc = [
        sum(traces[j] * ei[j * 3 + k] for j in range(3)) for k in range(3)
    ]

    c1 = -G + dgddet * det_fj
    Q = _mm33(ei, dj)
    qf = _mm33(Q, fj)
    v_loc = [
        c1 * ei[j * 3 + k] + qf[j * 3 + k] - bc[k] * 0.25
        for j in range(3) for k in range(3)
    ]

    abs_k = t["abs_k"]
    g0 = [
        (v_loc[0 * 3 + k] + v_loc[1 * 3 + k] + v_loc[2 * 3 + k] + bc[k])
        * abs_k
        for k in range(3)
    ]
    grads = g0 + [
        -v_loc[j * 3 + k] * abs_k for j in range(3) for k in range(3)
    ]
    ih = abs_k * G
    w2 = w * w
    reg = sum((dxpu[i] - z[i]) ** 2 for i in range(12))
    e_reg = ih + 0.5 * w2 * reg
    grads = [
        (grads[i] + w2 * (z[i] - dxpu[i])) * free[i] for i in range(12)
    ]
    return grads, ih, e_reg


_LEVENBERG = 1e-9


def hess_c3(z, cells, ehat, dxpu, w, free):
    """12x12 Jacobian of grad_c3 via 12 forward jvp passes + the vmap
    backend's fixed-coordinate masking."""
    one = jnp.ones_like(z[0])
    zero = jnp.zeros_like(z[0])
    H = [[None] * 12 for _ in range(12)]
    for j in range(12):
        tangent = [one if i == j else zero for i in range(12)]
        _, dgrads = jax.jvp(
            lambda zz: grad_c3(zz, cells, ehat, dxpu, w, free)[0],
            (z,), (tangent,),
        )
        for i in range(12):
            H[i][j] = dgrads[i]
    for i in range(12):
        for j in range(12):
            h = H[i][j] * free[i] * free[j]
            if i == j:
                h = h + (1.0 - free[i]) + _LEVENBERG
            H[i][j] = h
    return H


def _edet_c3(z):
    E = [z[3 * (j + 1) + d] - z[d] for d in range(3) for j in range(3)]
    return _det33(E)


# --- Pallas kernel + host wrapper ----------------------------------------

_TILE = 8 * 128


def make_prox_pallas3d(ehat_const, w: float, *, comp_mesh: bool = False,
                       chord: bool = False, interpret: bool = False):
    """Prox with the vmap backend's signature for D=3 problems
    (symmetric cell table or constant grid). ``comp_mesh=True`` takes
    the per-element xi-mesh edge matrix as 9 extra input tiles instead
    of the constant reference Ehat (AdaptationFunctional.cpp:176-201 —
    the 3DMonitor3 family); the component math is unchanged because the
    ehat entries are plain multiplicands either way.

    ``chord=True`` switches the sweep to the vmap backend's CHORD policy
    (``make_chord_sweeps``): the 12x12 Hessian lives in VMEM scratch,
    each sweep tries the cached-J step with one trial energy, and only
    rejecting tiles pay a refresh. Default for comp-mesh problems —
    weakly-regularized configs keep elements active for many sweeps and
    the exact-Newton sweep's full Hessian made the kernel LOSE to vmap
    there (VERDICT r4 item 4, commit b604b8f)."""
    import sys

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .prox_pallas2d import make_chord_sweeps
    from .monitor_grid import _cell_index

    if sys.getrecursionlimit() < 50000:
        sys.setrecursionlimit(50000)

    if comp_mesh:
        ehat_static = None
    else:
        eh = np.asarray(ehat_const, dtype=np.float64).reshape(-1)
        ehat_static = tuple(float(v) for v in eh)
    w = float(w)
    n = 12

    _tri = [(i, j) for i in range(12) for j in range(i + 1)]

    def _make_kernel(tol: float, max_iters: int):
        def kernel(*refs):
            if chord:
                *refs, hscr, pscr = refs
            if comp_mesh:
                (z_ref, dxpu_ref, free_ref, cells_ref, ehat_ref,
                 zout_ref, ih0_ref, zscr, ascr) = refs
                ehat = [ehat_ref[c, 0] for c in range(9)]
            else:
                (z_ref, dxpu_ref, free_ref, cells_ref,
                 zout_ref, ih0_ref, zscr, ascr) = refs
                ehat = ehat_static
            z = [z_ref[c, 0] for c in range(n)]
            dxpu = [dxpu_ref[c, 0] for c in range(n)]
            free = [free_ref[c, 0] for c in range(n)]
            cells = [
                [cells_ref[v * _ROW_W3 + k, 0] for k in range(_ROW_W3)]
                for v in range(4)
            ]
            tol_t = jnp.asarray(tol, z[0].dtype)

            ih0, _ = energy_c3(z, cells, ehat)
            fns = (
                lambda zz: energy_c3(zz, cells, ehat, dxpu, w),
                lambda zz: grad_c3(zz, cells, ehat, dxpu, w, free),
                lambda zz: hess_c3(zz, cells, ehat, dxpu, w, free),
                _edet_c3,
            )
            if chord:
                def h_read():
                    H = [[None] * n for _ in range(n)]
                    for t, (i, j) in enumerate(_tri):
                        H[i][j] = hscr[t]
                    return H

                def h_write(Hn, keep):
                    for t, (i, j) in enumerate(_tri):
                        v = Hn[i][j]
                        hscr[t] = (
                            v if keep is None
                            else jnp.where(keep, hscr[t], v)
                        )

                init_h, chord_iter = make_chord_sweeps(
                    n, *fns, w, tol_t, h_read, h_write, pl.when
                )
                init_h(z)

                def one_iter(nf, zc, active):
                    return chord_iter(nf, zc, active, pscr)
            else:
                one_iter = make_newton_sweeps(n, *fns, w, tol_t)
            ih0_ref[0] = ih0
            for c in range(n):
                zscr[c] = z[c]
            ascr[:] = jnp.ones_like(z[0])
            ones_t = jnp.ones_like(z[0])
            zeros_t = jnp.zeros_like(z[0])

            def body(_it, not_first_f):
                @pl.when(jnp.max(ascr[:]) > 0.5)
                def _():
                    zc = [zscr[c] for c in range(n)]
                    active = ascr[:] > 0.5
                    z_new, a_new = one_iter(
                        not_first_f > 0.5, zc, active
                    )
                    for c in range(n):
                        zscr[c] = z_new[c]
                    ascr[:] = jnp.where(a_new, ones_t, zeros_t)

                return jnp.ones((), z[0].dtype)

            jax.lax.fori_loop(
                0, max_iters, body, jnp.zeros((), z[0].dtype)
            )
            for c in range(n):
                zout_ref[c, 0] = zscr[c]

        return kernel

    call_cache: dict = {}

    def _get_call(tol, max_iters, T, dtype):
        key = (float(tol), int(max_iters), int(T), jnp.dtype(dtype).name)
        if key not in call_cache:
            nc = 4 * _ROW_W3
            spec_n = pl.BlockSpec(
                (n, 1, 8, 128), lambda i: (i * 0, i, i * 0, i * 0),
                memory_space=pltpu.VMEM,
            )
            spec_c = pl.BlockSpec(
                (nc, 1, 8, 128), lambda i: (i * 0, i, i * 0, i * 0),
                memory_space=pltpu.VMEM,
            )
            spec1 = pl.BlockSpec(
                (1, 8, 128), lambda i: (i, i * 0, i * 0),
                memory_space=pltpu.VMEM,
            )
            spec9 = pl.BlockSpec(
                (9, 1, 8, 128), lambda i: (i * 0, i, i * 0, i * 0),
                memory_space=pltpu.VMEM,
            )
            in_specs = [spec_n, spec_n, spec_n, spec_c]
            if comp_mesh:
                in_specs.append(spec9)
            scratch = [
                pltpu.VMEM((n, 8, 128), dtype),
                pltpu.VMEM((8, 128), dtype),
            ]
            if chord:
                # cached lower-triangular 12x12 Hessian (78 tiles) + the
                # per-sweep accepted step (merge buffer for the pl.when
                # refresh branch)
                scratch += [
                    pltpu.VMEM((len(_tri), 8, 128), dtype),
                    pltpu.VMEM((n, 8, 128), dtype),
                ]
            call_cache[key] = pl.pallas_call(
                _make_kernel(float(tol), int(max_iters)),
                grid=(T,),
                in_specs=in_specs,
                out_specs=(spec_n, spec1),
                out_shape=(
                    jax.ShapeDtypeStruct((n, T, 8, 128), dtype),
                    jax.ShapeDtypeStruct((T, 8, 128), dtype),
                ),
                scratch_shapes=scratch,
                interpret=interpret,
            )
        return call_cache[key]

    def _to_tiles(a2d, nfp):
        nf, c = a2d.shape
        pad = nfp - nf
        if pad:
            a2d = jnp.concatenate(
                [a2d, jnp.broadcast_to(a2d[:1], (pad, c))]
            )
        return a2d.T.reshape(c, nfp // _TILE, 8, 128)

    def _cell_rows(grid, z):
        """[NF, 4, 54] per-vertex cell data (values + bounds)."""
        nf = z.shape[0]
        ax, ay, az = grid.axes
        ncell = ax.shape[0] - 1
        xi = _cell_index(z[..., 0], ax)  # [NF, 4]
        yi = _cell_index(z[..., 1], ay)
        zi = _cell_index(z[..., 2], az)
        bounds = jnp.stack(
            [ax[xi], ax[xi + 1], ay[yi], ay[yi + 1], az[zi], az[zi + 1]],
            axis=-1,
        )  # [NF, 4, 6]
        if grid.constant:
            flat0 = grid.values.reshape(-1, 9)[0]
            sym = flat0[jnp.asarray([0, 1, 2, 4, 5, 8])]
            vals = jnp.broadcast_to(
                jnp.tile(sym, 8), (nf, 4, 48)
            ).astype(z.dtype)
        else:
            ci = (zi * ncell + yi) * ncell + xi
            vals = grid.cell_table[ci.reshape(-1)].reshape(nf, 4, 48)
        return jnp.concatenate([vals, bounds.astype(z.dtype)], axis=-1)

    def prox(grid, z, xi, dxpu, free_mask, tol, max_iters, J_state=None):
        nf = z.shape[0]
        T = -(-nf // _TILE)
        nfp = T * _TILE

        rows = _cell_rows(grid, z)
        cells_t = _to_tiles(rows.reshape(nf, 4 * _ROW_W3), nfp)
        z_t = _to_tiles(z.reshape(nf, n), nfp)
        dxpu_t = _to_tiles(dxpu.reshape(nf, n), nfp)
        free_t = _to_tiles(free_mask.reshape(nf, n), nfp)

        args = [z_t, dxpu_t, free_t, cells_t]
        if comp_mesh:
            # per-element xi-mesh Ehat, row-major [d, j] = xi_{j+1} - xi_0
            # (huang._common_terms comp-mesh branch)
            eh_e = jnp.swapaxes(xi[:, 1:] - xi[:, :1], 1, 2)  # [NF, 3, 3]
            args.append(_to_tiles(eh_e.reshape(nf, 9), nfp))

        zo, ih0 = _get_call(tol, max_iters, T, z.dtype)(*args)
        z_opt = zo.reshape(n, nfp).T[:nf].reshape(nf, 4, 3)
        ih0 = ih0.reshape(nfp)[:nf]
        if J_state is None:
            return z_opt, ih0
        return z_opt, ih0, J_state[0]

    def tiled_call(z_t, dxpu_t, free_t, cells_t, tol, max_iters):
        """Direct kernel entry on ALREADY-TILED channel-major inputs —
        the SoA big-tier path (integrators/admm_soa.py) builds its tiles
        from flat layouts without ever materializing [NF, 4, ...] blobs.
        z_t/dxpu_t/free_t: [12, T, 8, 128]; cells_t: [216, T, 8, 128]
        (per-vertex 48 corner entries + 6 bounds, vertex-major).
        Returns (z_t' [12, T, 8, 128], ih0_t [T, 8, 128])."""
        T = z_t.shape[1]
        return _get_call(tol, max_iters, T, z_t.dtype)(
            z_t, dxpu_t, free_t, cells_t
        )

    prox.tiled_call = tiled_call
    prox.TILE = _TILE
    prox.ROW_W = _ROW_W3
    return prox
