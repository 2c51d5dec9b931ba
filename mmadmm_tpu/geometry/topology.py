"""Mesh topology: orientation, incidence, boundary faces, partitioning.

Replaces the reference's per-element/per-node STL-set topology builds
(``src/Mesh.cpp:51-112,244-260``) with vectorized NumPy producing the dense
index arrays the device code needs:

* ``reorient_elements`` — positive-orientation fix (``Mesh.cpp:244-260``),
* ``node_degrees`` — the diagonal of ``D^T D`` (number of element slots per
  node), which makes the ADMM x-update matrix
  ``t = M + dt^2 (WD)^T (WD)`` (``MeshIntegrator.cpp:43-58``) diagonal,
* ``sorted_scatter_plan`` — a sort-based layout for deterministic, fast
  segment-sum scatter-add of per-element values to nodes on TPU,
* ``build_boundary_faces`` — boundary face list + per-node face sets
  (``Mesh.cpp:62-112``) used by (optional) free-boundary projection,
* ``partition_elements`` — recursive coordinate bisection over element
  centroids for multi-device sharding (the reference has no partitioner; its
  only parallelism is OpenMP over elements, ``Mesh.cpp:945-948``).
"""

from __future__ import annotations

import numpy as np

from .node_type import NodeType


def element_edge_dets(X: np.ndarray, F: np.ndarray) -> np.ndarray:
    """det of the edge matrix E = [x1-x0, ..., xD-x0] per element."""
    V = X[F]  # [NF, D+1, D]
    E = V[:, 1:, :] - V[:, :1, :]  # rows are edges; det(E^T) == det(E)
    D = X.shape[1]
    if D == 2:
        return E[:, 0, 0] * E[:, 1, 1] - E[:, 0, 1] * E[:, 1, 0]
    elif D == 3:
        a, b, c = E[:, 0], E[:, 1], E[:, 2]
        return np.einsum("ij,ij->i", a, np.cross(b, c))
    raise ValueError("D must be 2 or 3")


def reorient_elements(X: np.ndarray, F: np.ndarray) -> np.ndarray:
    """Swap columns 1 and 2 of negatively-oriented elements.

    Note: the edge matrix in ``Mesh.cpp:248-253`` has edges as *columns*
    (E.col(j) = x_{j+1} - x_0); our helper uses rows. det(A^T) = det(A), so
    the sign test is identical.
    """
    F = F.copy()
    neg = element_edge_dets(X, F) < 0
    F[neg, 1], F[neg, 2] = F[neg, 2].copy(), F[neg, 1].copy()
    return F


def node_degrees(F: np.ndarray, n_pnts: int) -> np.ndarray:
    """Number of (element, slot) references per node — diag of D^T D."""
    return np.bincount(F.ravel(), minlength=n_pnts).astype(np.int32)


def sorted_scatter_plan(F: np.ndarray, n_pnts: int):
    """Precompute a sort-based scatter layout for ``D^T`` application.

    Returns ``(perm, seg_ids)`` where ``perm`` permutes the flattened
    ``[NF*(D+1)]`` element-slot axis into node-sorted order and ``seg_ids``
    are the node ids in that order; ``jax.ops.segment_sum(vals[perm],
    seg_ids, n_pnts, indices_are_sorted=True)`` is then a deterministic,
    TPU-friendly scatter-add equivalent to multiplying by ``Dmat^T``
    (``Mesh.cpp:704-753``).
    """
    flat = F.ravel()
    perm = np.argsort(flat, kind="stable").astype(np.int32)
    seg_ids = flat[perm].astype(np.int32)
    return perm, seg_ids


def dense_scatter_plan(F: np.ndarray, n_pnts: int):
    """Degree-padded gather plan for ``D^T`` application.

    Returns ``(idx [NP, K] int32, K)`` where row p lists the flat
    element-slot positions (into ``[NF*(D+1)]``) referencing node p, padded
    with ``NF*(D+1)`` (a zero row appended by the caller). ``D^T y`` is then
    ``y_padded[idx].sum(axis=1)`` — one gather + a VPU reduction instead of
    a scatter instruction (TPU scatters are ~3x slower at production
    sizes)."""
    flat = F.ravel()
    order = np.argsort(flat, kind="stable")
    seg = flat[order]
    counts = np.bincount(flat, minlength=n_pnts)
    K = int(counts.max()) if counts.size else 0
    idx = np.full((n_pnts, K), flat.size, dtype=np.int32)  # padding index
    # rank of each entry within its node run
    starts = np.zeros(n_pnts + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])
    ranks = np.arange(flat.size) - starts[seg]
    idx[seg, ranks] = order.astype(np.int32)
    return idx, K


def build_boundary_faces(F: np.ndarray, mask: np.ndarray):
    """Boundary faces: elements with exactly D non-INTERIOR vertices
    contribute the face of those vertices (``Mesh.cpp:73-104``).

    Returns ``faces [NBF, D] int32`` in element order, with vertices in the
    element's slot order (matching the reference's construction).
    """
    Dp1 = F.shape[1]
    non_int = mask[F] != NodeType.INTERIOR  # [NF, D+1]
    counts = non_int.sum(axis=1)
    rows = np.nonzero(counts == Dp1 - 1)[0]
    if rows.size == 0:
        return np.zeros((0, Dp1 - 1), dtype=np.int32)
    sel = non_int[rows]  # [NBF, D+1], exactly D True per row
    faces = F[rows][sel].reshape(rows.size, Dp1 - 1)
    return faces.astype(np.int32)


def partition_elements(X: np.ndarray, F: np.ndarray, n_parts: int) -> np.ndarray:
    """Recursive coordinate bisection over element centroids.

    Returns a permutation of element indices such that contiguous equal-size
    chunks are spatially compact (n_parts must divide into the recursion as a
    power-of-two-ish split; any n_parts works via uneven median splits).
    """
    nf = F.shape[0]
    cent = X[F].mean(axis=1)  # [NF, D]
    order = np.arange(nf)

    def rcb(idx: np.ndarray, k: int) -> np.ndarray:
        if k <= 1 or idx.size <= 1:
            return idx
        spans = cent[idx].max(axis=0) - cent[idx].min(axis=0)
        ax = int(np.argmax(spans))
        kl = k // 2
        n_left = (idx.size * kl) // k
        part = np.argpartition(cent[idx, ax], max(n_left - 1, 0))
        left = idx[part[:n_left]]
        right = idx[part[n_left:]]
        return np.concatenate([rcb(left, kl), rcb(right, k - kl)])

    return rcb(order, n_parts).astype(np.int32)
