"""Free-slip boundary projection (reference ``Mesh::projectOntoBoundary``,
``src/Mesh.cpp:119-241``).

Projects ``BOUNDARY_FREE`` nodes onto their nearest incident boundary face
— the closest point on any boundary edge (2D, ``projection2D``,
Mesh.cpp:119-174) or the closest in-triangle barycentric projection (3D,
``projection3D``, Mesh.cpp:176-233). In the reference every call site is
commented out (Mesh.cpp:636-642, 975-984, 1020-1026) — the capability is
carried but dormant; here it is provided the same way, as
``MovingMesh.project_onto_boundary`` for optional use after integrator
steps (never in the hot compiled loop, matching reference behavior).

TPU-native shape: the per-node incident-face sets (the reference's
``faceConnects`` hash-map of sets, Mesh.cpp:62-112) become a static padded
table built host-side at setup; the projection is one vmapped, branch-free
candidate-min over the padded face axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.node_type import NodeType


def build_incidence(faces: np.ndarray, mask: np.ndarray):
    """Padded node->incident-boundary-face table for BOUNDARY_FREE nodes.

    Returns ``(node_ids [NB], face_verts [NB, K, D] int32, valid [NB, K])``
    with K = max incident boundary faces over the free nodes; unused slots
    repeat face 0 with valid=0.
    """
    free_nodes = np.nonzero(mask == NodeType.BOUNDARY_FREE)[0].astype(np.int32)
    nb = free_nodes.size
    dim = faces.shape[1] if faces.size else 0
    if nb == 0 or faces.size == 0:
        return free_nodes, np.zeros((nb, 0, dim), np.int32), np.zeros((nb, 0))

    incident: dict[int, list[int]] = {int(n): [] for n in free_nodes}
    for fi, fverts in enumerate(faces):
        for v in fverts:
            if int(v) in incident:
                incident[int(v)].append(fi)
    K = max(1, max(len(v) for v in incident.values()))
    table = np.zeros((nb, K), dtype=np.int32)
    valid = np.zeros((nb, K), dtype=np.float64)
    for i, n in enumerate(free_nodes):
        ids = incident[int(n)]
        table[i, : len(ids)] = ids
        valid[i, : len(ids)] = 1.0
    return free_nodes, faces[table], valid  # [NB], [NB, K, D], [NB, K]


def _project_node_2d(node, fpts, fvalid):
    """Reference projection2D (Mesh.cpp:119-174): per incident edge, the
    candidate is the segment projection when the projection's sign pattern
    matches the edge direction and 0<t<1; endpoint x1 on sign mismatch;
    endpoint x2 when t>1; otherwise the edge contributes nothing."""
    x1, x2 = fpts[:, 0], fpts[:, 1]  # [K, 2]
    u = x2 - x1
    w = node[None, :] - x1
    uu = jnp.sum(u * u, axis=1)
    alpha = jnp.sum(u * w, axis=1) / jnp.where(uu > 0, uu, 1.0)
    proj = alpha[:, None] * u
    d_proj = jnp.linalg.norm(proj - w, axis=1)
    t = jnp.abs(alpha)
    sgns = jnp.all(jnp.sign(u) == jnp.sign(proj), axis=1)
    in_seg = sgns & (t > 0.0) & (t < 1.0)
    p_seg = (1.0 - t)[:, None] * x1 + t[:, None] * x2

    d_x1 = jnp.linalg.norm(x1 - node[None, :], axis=1)
    d_x2 = jnp.linalg.norm(x2 - node[None, :], axis=1)

    inf = jnp.asarray(jnp.inf, node.dtype)
    cand_d = jnp.where(
        in_seg, d_proj, jnp.where(~sgns, d_x1, jnp.where(t > 1.0, d_x2, inf))
    )
    cand_p = jnp.where(
        in_seg[:, None], p_seg,
        jnp.where(~sgns[:, None], x1, jnp.where((t > 1.0)[:, None], x2, x1)),
    )
    cand_d = jnp.where(fvalid > 0, cand_d, inf)
    best = jnp.argmin(cand_d)
    return jnp.where(jnp.isfinite(cand_d[best]), cand_p[best], node)


def _project_node_3d(node, fpts, fvalid):
    """Reference projection3D (Mesh.cpp:176-233): barycentric projection
    onto each incident triangle's plane; a candidate only when all
    barycentric coords >= CHECK_EPS; the node stays put if none qualify."""
    CHECK_EPS = 1e-10
    q, p1, p2 = fpts[:, 0], fpts[:, 1], fpts[:, 2]  # [K, 3]
    u = p1 - q
    v = p2 - q
    n = jnp.cross(u, v)
    nn = jnp.sum(n * n, axis=1)
    temp = 1.0 / jnp.where(nn > 0, nn, 1.0)
    w = node[None, :] - q
    b2 = jnp.sum(jnp.cross(u, w) * n, axis=1) * temp
    b1 = jnp.sum(jnp.cross(w, v) * n, axis=1) * temp
    b0 = 1.0 - b1 - b2
    proj = b0[:, None] * q + b1[:, None] * p1 + b2[:, None] * p2
    dist = jnp.linalg.norm(proj - node[None, :], axis=1)
    ok = (
        (b0 >= CHECK_EPS) & (b1 >= CHECK_EPS) & (b2 >= CHECK_EPS)
        & (fvalid > 0)
    )
    inf = jnp.asarray(jnp.inf, node.dtype)
    cand_d = jnp.where(ok, dist, inf)
    best = jnp.argmin(cand_d)
    return jnp.where(jnp.isfinite(cand_d[best]), proj[best], node)


def make_boundary_projector(faces: np.ndarray, mask: np.ndarray, dim: int):
    """Jittable ``project(x, ref_x=None) -> x'`` moving each BOUNDARY_FREE
    node of the proposed positions ``x`` to its projection onto the
    incident boundary faces evaluated at the COMMITTED positions ``ref_x``
    (the reference passes the candidate coordinate but reads face vertices
    from ``Vp``, Mesh.cpp:134-136/198-200). ``ref_x`` defaults to ``x``,
    which is degenerate for a node's own incident faces — callers should
    pass the pre-step geometry, as the reference's (dormant) call sites
    would have."""
    node_ids_np, fverts_np, valid_np = build_incidence(faces, mask)
    if node_ids_np.size == 0 or fverts_np.shape[1] == 0:
        return lambda x, ref_x=None: x
    node_ids = jnp.asarray(node_ids_np)
    fverts = jnp.asarray(fverts_np)  # [NB, K, D] vertex ids
    proj_one = _project_node_2d if dim == 2 else _project_node_3d

    def project(x, ref_x=None):
        if ref_x is None:
            ref_x = x
        valid = jnp.asarray(valid_np, x.dtype)
        nodes = x[node_ids]  # [NB, D]
        fpts = ref_x[fverts]  # [NB, K, D, D]
        moved = jax.vmap(proj_one)(nodes, fpts, valid)
        return x.at[node_ids].set(moved)

    return project
