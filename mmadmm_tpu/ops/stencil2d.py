"""Shared 2D structured-grid stencil operators (uniform rect mesh with
cell midpoints, ``MeshUtils.h:104-155`` layout).

Factored out of ``integrators/admm_grid2d.py`` so the backward-Euler
path can run its Jacobian-vector products on the same zero-index-op
engine: ``D x`` as window slices of the grid/midpoint pages and ``D^T y``
as shifted pad-adds. See the admm_grid2d module docstring for the
design; the reorientation swap masks and carve alive masks are threaded
as call arguments (they are data, not program).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# canonical cell split (MeshUtils.h:128-153)
VMAP_2D = {
    0: ("bl", "M", "tl"),   # Left
    1: ("M", "tr", "tl"),   # Top
    2: ("M", "tr", "br"),   # Right
    3: ("bl", "br", "M"),   # Bottom
}


def make_stencil_ops(nx: int, ny: int):
    """Returns ``(gather_ch, scatter_ch)`` for the (nx, ny) cell grid.

    ``gather_ch(x [NP, 2], swap_k [4, ny, nx]) -> [6, NFd]`` channel-major
    slot values (channel = v*2 + d, dense element order e = cell*4 + k).

    ``scatter_ch(y [6, NFd], swap_k, alive_k) -> [NP, 2]`` masked D^T.
    """
    stride = (nx + 1) * (ny + 1)
    NFd = 4 * nx * ny

    def corner_planes(page):
        return page[:-1, :-1], page[:-1, 1:], page[1:, :-1], page[1:, 1:]

    def gather_ch(x, swap_k):
        chans = [None] * 6
        for d in range(2):
            page = x[:stride, d].reshape(ny + 1, nx + 1)
            M = x[stride:, d].reshape(ny, nx)
            bl, br, tl, tr = corner_planes(page)
            src = dict(bl=bl, br=br, tl=tl, tr=tr, M=M)
            for v in range(3):
                per_k = []
                for k in range(4):
                    a = src[VMAP_2D[k][v]]
                    if v in (1, 2):
                        b = src[VMAP_2D[k][3 - v]]
                        sk = swap_k[k]
                        a = sk * b + (1.0 - sk) * a
                    per_k.append(a)
                chans[v * 2 + d] = jnp.stack(per_k, axis=-1).reshape(NFd)
        return jnp.stack(chans)

    def scatter_ch(y, swap_k, alive_k):
        cols = []
        for d in range(2):
            acc = {
                kk: jnp.zeros((ny, nx), y.dtype)
                for kk in ("bl", "br", "tl", "tr", "M")
            }
            per_v = [y[v * 2 + d].reshape(ny, nx, 4) for v in range(3)]
            for k in range(4):
                av = alive_k[k]
                sk = swap_k[k]
                pv = [per_v[v][:, :, k] * av for v in range(3)]
                p1 = sk * pv[2] + (1.0 - sk) * pv[1]
                p2 = sk * pv[1] + (1.0 - sk) * pv[2]
                canon = (pv[0], p1, p2)
                for v in range(3):
                    tgt = VMAP_2D[k][v]
                    acc[tgt] = acc[tgt] + canon[v]

            def pad(a, jlo, ilo):
                return jax.lax.pad(
                    a, jnp.asarray(0.0, a.dtype),
                    [(jlo, 1 - jlo, 0), (ilo, 1 - ilo, 0)],
                )

            page = (
                pad(acc["bl"], 0, 0) + pad(acc["br"], 0, 1)
                + pad(acc["tl"], 1, 0) + pad(acc["tr"], 1, 1)
            )
            cols.append(
                jnp.concatenate(
                    [page.reshape(stride), acc["M"].reshape(nx * ny)]
                )
            )
        return jnp.stack(cols, axis=1)

    return gather_ch, scatter_ch


def match_dense(nx: int, ny: int, F_mesh):
    """Match a mesh's compact F (order-preserving carve + possible
    v1<->v2 reorientation swaps) to the canonical dense element order.

    Returns ``(alive [NFd] bool, swapped [NFd] bool,
    mesh_of_dense [NFd] int64)``.
    """
    import numpy as np

    stride = (nx + 1) * (ny + 1)
    ii, jj = np.meshgrid(np.arange(nx), np.arange(ny), indexing="xy")
    ii = ii.ravel()
    jj = jj.ravel()
    bl = ii + jj * (nx + 1)
    br = ii + 1 + jj * (nx + 1)
    tl = ii + (jj + 1) * (nx + 1)
    tr = ii + 1 + (jj + 1) * (nx + 1)
    mid = stride + ii + jj * nx
    ncell = nx * ny
    Fc = np.empty((4 * ncell, 3), dtype=np.int64)
    Fc[0::4] = np.stack([bl, mid, tl], axis=1)
    Fc[1::4] = np.stack([mid, tr, tl], axis=1)
    Fc[2::4] = np.stack([mid, tr, br], axis=1)
    Fc[3::4] = np.stack([bl, br, mid], axis=1)

    NFd = Fc.shape[0]
    Fm = np.asarray(F_mesh, dtype=np.int64)
    keys_c = np.sort(Fc, axis=1)
    keys_m = np.sort(Fm, axis=1)
    alive = np.zeros(NFd, dtype=bool)
    swapped = np.zeros(NFd, dtype=bool)
    mesh_of_dense = np.full(NFd, -1, dtype=np.int64)
    mi = 0
    NF = Fm.shape[0]
    for e in range(NFd):
        if mi < NF and np.array_equal(keys_c[e], keys_m[mi]):
            alive[e] = True
            mesh_of_dense[e] = mi
            if not np.array_equal(Fc[e], Fm[mi]):
                assert np.array_equal(Fc[e][[0, 2, 1]], Fm[mi]), (
                    f"unexpected vertex permutation at element {mi}"
                )
                swapped[e] = True
            mi += 1
    assert mi == NF, f"dense/compact matching failed ({mi} of {NF})"
    return alive, swapped, mesh_of_dense
