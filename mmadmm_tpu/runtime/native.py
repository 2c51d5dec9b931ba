"""ctypes bindings for the native C++ setup kernels (native/mmnative.cpp).

The reference keeps its setup/support machinery in native C++ (nanoflann
KD-tree NN queries, LASolver CSR — SURVEY §2.2); these bindings provide the
rebuild's equivalents, with pure-Python/SciPy fallbacks so nothing hard-
depends on the compiled library. The library is auto-built on first use
(``make`` in ``native/``) when a toolchain is available.

Env: MMADMM_NATIVE=0 disables native entirely (forces fallbacks).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmmnative.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("MMADMM_NATIVE", "1") == "0":
        return None
    if not os.path.exists(_LIB_PATH) and os.path.isdir(_NATIVE_DIR):
        try:
            subprocess.run(
                ["make", "-s"], cwd=_NATIVE_DIR, check=True,
                capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.mm_grid_nn_map.restype = ctypes.c_int
        lib.mm_grid_nn_map.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
        ]
        lib.mm_glibc_rand_fill.restype = ctypes.c_int
        lib.mm_glibc_rand_fill.argtypes = [
            ctypes.c_int32, ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


def grid_nn_map(X: np.ndarray, lo: np.ndarray, hi: np.ndarray, n: int) -> np.ndarray:
    """Nearest-vertex index for every node of the (n+1)^D grid over
    [lo, hi]. Returns int64 flat array in the monitor-grid layout (x
    fastest). Falls back to scipy cKDTree."""
    X = np.ascontiguousarray(X, dtype=np.float64)
    npts, D = X.shape
    lo = np.ascontiguousarray(lo, dtype=np.float64)
    hi = np.ascontiguousarray(hi, dtype=np.float64)
    lib = _load()
    if lib is not None:
        out = np.empty((n + 1) ** D, dtype=np.int64)
        rc = lib.mm_grid_nn_map(
            X.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            npts, D,
            lo.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            hi.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        if rc == 0 and (out >= 0).all():
            return out
    # SciPy fallback (same layout: meshgrid x-fastest)
    from scipy.spatial import cKDTree

    axes = [lo[d] + np.arange(n + 1) * (hi[d] - lo[d]) / n for d in range(D)]
    if D == 2:
        gx, gy = np.meshgrid(axes[0], axes[1], indexing="xy")
        q = np.stack([gx.ravel(), gy.ravel()], axis=1)
    else:
        gz, gy, gx = np.meshgrid(axes[2], axes[1], axes[0], indexing="ij")
        q = np.stack([gx.ravel(), gy.ravel(), gz.ravel()], axis=1)
    _, nn = cKDTree(X).query(q)
    return nn.astype(np.int64)


def glibc_rand_fill(seed: int, count: int) -> np.ndarray:
    """The glibc TYPE_3 rand() stream after srand(seed) (reference
    main.cpp:785, srand(69)). Falls back to the pure-Python generator."""
    lib = _load()
    if lib is not None:
        out = np.empty(count, dtype=np.int32)
        rc = lib.mm_glibc_rand_fill(
            int(seed), int(count),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        if rc == 0:
            return out
    from ..geometry.glibc_rand import GlibcRand

    return GlibcRand(seed).rand_array(count)
