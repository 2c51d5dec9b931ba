"""3D structured-grid stencil operators (uniform box mesh, 12 tets/cell
with centroids — ``MeshUtils.h:205-295`` layout).

The 3D analogue of ``stencil2d.py``, built for the SoA big-tier engine:
on SquareGrid/Shoulder box meshes (nodes NEVER compacted by the carve)
the element↔node incidence is a stencil, so ``D x`` is window slices of
the grid/centroid pages and ``D^T y`` is 8 shifted pad-adds + a centroid
add — replacing the two index-bound ops that dominate the 6.1M-tet
ADMM iteration (gather ~175 ms + node-slab scatter ~270 ms per
iteration at 3DMonitor280).

Element order is the generator's: e = 12*cell + t, cells raveled
(k, j, i) i-fast. Per tet t, vertices 0..2 are cell corners (offsets in
{0,1}^3) and vertex 3 is the centroid; ``reOrientElements`` may swap
vertices 1 and 2 per element (data-dependent after the Shoulder
perturbation), handled by per-(cell, t) swap masks from the actual mesh
F. Carved cells ride as DEAD elements (alive=0).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# per tet t, the corner offsets (di, dj, dk) of vertices 0..2
# (MeshUtils.h:213-291; vertex 3 is always the centroid)
TETS_3D = [
    ((0, 0, 0), (1, 0, 0), (1, 1, 0)),
    ((0, 0, 0), (0, 1, 0), (1, 1, 0)),
    ((0, 0, 1), (1, 0, 1), (1, 1, 1)),
    ((0, 0, 1), (0, 1, 1), (1, 1, 1)),
    ((0, 0, 0), (0, 1, 0), (0, 1, 1)),
    ((0, 0, 0), (0, 0, 1), (0, 1, 1)),
    ((1, 0, 0), (1, 1, 0), (1, 1, 1)),
    ((1, 0, 0), (1, 0, 1), (1, 1, 1)),
    ((0, 0, 0), (1, 0, 0), (0, 0, 1)),
    ((1, 0, 0), (1, 0, 1), (0, 0, 1)),
    ((0, 1, 0), (1, 1, 0), (0, 1, 1)),
    ((1, 1, 0), (1, 1, 1), (0, 1, 1)),
]


def canonical_dense_3d(nx: int, ny: int, nz: int) -> np.ndarray:
    """Canonical (pre-reorient) dense F for the uniform box mesh."""
    sxy = (nx + 1) * (ny + 1)
    stride = sxy * (nz + 1)
    k3, j3, i3 = np.meshgrid(
        np.arange(nz), np.arange(ny), np.arange(nx), indexing="ij"
    )
    i3, j3, k3 = i3.ravel(), j3.ravel(), k3.ravel()

    def g(di, dj, dk):
        return (i3 + di) + (j3 + dj) * (nx + 1) + (k3 + dk) * sxy

    mid = stride + i3 + j3 * nx + k3 * (nx * ny)
    ncell = nx * ny * nz
    F = np.empty((12 * ncell, 4), dtype=np.int64)
    for t, (a, b, c) in enumerate(TETS_3D):
        F[t::12] = np.stack([g(*a), g(*b), g(*c), mid], axis=1)
    return F


def match_dense_3d(nx: int, ny: int, nz: int, F_mesh):
    """Match a compact mesh F (order-preserving carve + possible v1<->v2
    reorientation swaps) to the dense order. Returns
    (alive [NFd], swapped [NFd], mesh_of_dense [NFd])."""
    Fc = canonical_dense_3d(nx, ny, nz)
    Fm = np.asarray(F_mesh, dtype=np.int64)
    NFd, NF = Fc.shape[0], Fm.shape[0]
    keys_c = np.sort(Fc, axis=1)
    keys_m = np.sort(Fm, axis=1)
    alive = np.zeros(NFd, dtype=bool)
    swapped = np.zeros(NFd, dtype=bool)
    mesh_of_dense = np.full(NFd, -1, dtype=np.int64)
    mi = 0
    for e in range(NFd):
        if mi < NF and np.array_equal(keys_c[e], keys_m[mi]):
            alive[e] = True
            mesh_of_dense[e] = mi
            if not np.array_equal(Fc[e], Fm[mi]):
                assert np.array_equal(Fc[e][[0, 2, 1, 3]], Fm[mi]), (
                    f"unexpected vertex permutation at element {mi}"
                )
                swapped[e] = True
            mi += 1
    assert mi == NF, f"dense/compact 3D matching failed ({mi} of {NF})"
    return alive, swapped, mesh_of_dense


def make_stencil_ops_3d(nx: int, ny: int, nz: int):
    """Returns ``(gather_ch, scatter_ch)``.

    ``gather_ch(xg [3, NPg], xm [3, ncell], swap_t [12, ncell])
      -> list of 12 channel vecs [NFd]`` (channel = v*3 + d).
    ``scatter_ch(chans list of 12 [NFd], swap_t, alive_t [12, ncell])
      -> (sg [3, NPg], sm [3, ncell])`` masked D^T.
    """
    sxy = (nx + 1) * (ny + 1)
    NPg = sxy * (nz + 1)
    ncell = nx * ny * nz
    NFd = 12 * ncell

    def corner(page, di, dj, dk):
        return page[
            dk:dk + nz, dj:dj + ny, di:di + nx
        ]

    def gather_ch(xg, xm, swap_t):
        chans = [None] * 12
        for d in range(3):
            page = xg[d].reshape(nz + 1, ny + 1, nx + 1)
            M = xm[d].reshape(nz, ny, nx)
            corners = {
                off: corner(page, *off)
                for off in {o for tet in TETS_3D for o in tet}
            }
            for v in range(4):
                per_t = []
                for t in range(12):
                    if v == 3:
                        a = M
                    else:
                        a = corners[TETS_3D[t][v]]
                        if v in (1, 2):
                            b = corners[TETS_3D[t][3 - v]]
                            sk = swap_t[t].reshape(nz, ny, nx)
                            a = sk * b + (1.0 - sk) * a
                    per_t.append(a.reshape(ncell))
                # e = 12*cell + t -> t minor
                chans[v * 3 + d] = jnp.stack(per_t, axis=-1).reshape(NFd)
        return chans

    def scatter_ch(chans, swap_t, alive_t):
        sg_out, sm_out = [], []
        offs = sorted({o for tet in TETS_3D for o in tet})
        for d in range(3):
            acc = {off: jnp.zeros((nz, ny, nx), chans[0].dtype)
                   for off in offs}
            accM = jnp.zeros((nz, ny, nx), chans[0].dtype)
            per_v = [
                chans[v * 3 + d].reshape(ncell, 12) for v in range(4)
            ]
            for t in range(12):
                av = alive_t[t].reshape(nz, ny, nx)
                sk = swap_t[t].reshape(nz, ny, nx)
                pv = [
                    per_v[v][:, t].reshape(nz, ny, nx) * av
                    for v in range(4)
                ]
                p1 = sk * pv[2] + (1.0 - sk) * pv[1]
                p2 = sk * pv[1] + (1.0 - sk) * pv[2]
                canon = (pv[0], p1, p2)
                for v in range(3):
                    off = TETS_3D[t][v]
                    acc[off] = acc[off] + canon[v]
                accM = accM + pv[3]

            def pad(a, off):
                di, dj, dk = off
                return jax.lax.pad(
                    a, jnp.asarray(0.0, a.dtype),
                    [(dk, 1 - dk, 0), (dj, 1 - dj, 0), (di, 1 - di, 0)],
                )

            page = None
            for off in offs:
                p = pad(acc[off], off)
                page = p if page is None else page + p
            sg_out.append(page.reshape(NPg))
            sm_out.append(accM.reshape(ncell))
        return jnp.stack(sg_out), jnp.stack(sm_out)

    return gather_ch, scatter_ch
