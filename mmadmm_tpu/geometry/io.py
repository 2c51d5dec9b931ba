"""Mesh file IO in the reference's CSV formats.

* points/triangles writers: ``Mesh::outputPoints`` / ``outputSimplices``
  (``src/Mesh.cpp:1067-1095``) — comma-separated rows.
* readers: ``utils::readTriangles`` (``src/MeshUtils.h:669-733``) — the
  ``FromFile`` test type / de-facto checkpoint-restore path. The reference's
  mask reader appends one spurious trailing entry after EOF
  (``MeshUtils.h:704-712``); we read exactly what's there.
"""

from __future__ import annotations

import numpy as np

from .node_type import NodeType


def read_points(path: str) -> np.ndarray:
    return np.loadtxt(path, delimiter=",", ndmin=2, dtype=np.float64)


def read_triangles(path: str) -> np.ndarray:
    return np.loadtxt(path, delimiter=",", ndmin=2, dtype=np.int64).astype(np.int32)


def read_mask(path: str, n_pnts: int | None = None) -> np.ndarray:
    vals = np.loadtxt(path, ndmin=1, dtype=np.int64).astype(np.int8)
    if n_pnts is not None:
        vals = vals[:n_pnts]
    return vals


def read_mesh(tri_path: str, pnts_path: str, mask_path: str):
    """FromFile experiment input (main.cpp:771-776)."""
    F = read_triangles(tri_path)
    X = read_points(pnts_path)
    mask = read_mask(mask_path, X.shape[0])
    return X, F, mask


def write_points(path: str, X: np.ndarray) -> None:
    with open(path, "w") as f:
        for row in np.asarray(X):
            f.write(", ".join(_fmt(v) for v in row) + "\n")


def write_triangles(path: str, F: np.ndarray) -> None:
    with open(path, "w") as f:
        for row in np.asarray(F):
            f.write(", ".join(str(int(v)) for v in row) + "\n")


def write_mask(path: str, mask: np.ndarray) -> None:
    with open(path, "w") as f:
        for v in np.asarray(mask):
            f.write(f"{int(v)}\n")


def write_energy_trace(path: str, t_vals, i_vals) -> None:
    """``outputVecToFile`` format: 'time, Ih' rows (main.cpp:131-140)."""
    with open(path, "w") as f:
        for t, ih in zip(t_vals, i_vals):
            f.write(f"{_fmt(t)}, {_fmt(ih)}\n")


def _fmt(v: float) -> str:
    """C++ ostream default formatting for double (6 significant digits)."""
    return f"{float(v):.6g}"
