"""Small dense linear algebra, unrolled for static sizes.

The prox Newton systems are tiny symmetric matrices (6x6 in 2D, 12x12 in
3D, one per element). ``jnp.linalg.solve`` lowers to a batched LU kernel
that the TPU compiler only implements for f32 (``LuDecomposition``), and is
slow even then; an unrolled LDL^T factorization is pure VPU code — fully
fused by XLA across the vmapped element batch, works in any dtype (incl.
emulated f64), and has no data-dependent control flow.

Replaces the role of the reference's per-element ``Eigen::...lu().solve``
inside BFGS/Newton (``src/Mesh.cpp:778-928``).
"""

from __future__ import annotations

import jax.numpy as jnp

_DIAG_FLOOR = 1e-12


def ldlt_solve(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve ``A x = b`` for one small symmetric matrix via LDL^T without
    pivoting (no sqrt). ``A: [n, n]``, ``b: [n]``, n static.

    Diagonal pivots are clamped away from zero (sign-preserving) so
    near-singular systems give large-but-finite steps instead of NaN; the
    caller safeguards the step anyway.
    """
    n = A.shape[-1]
    # dtype-typed floor: a bare Python float would be a weak-f64 scalar
    # under x64, which Mosaic (Pallas TPU) refuses to materialize
    floor = jnp.asarray(_DIAG_FLOOR, A.dtype)
    # factor: A = L D L^T  (L unit lower triangular, D diagonal)
    L = [[None] * n for _ in range(n)]
    D = [None] * n
    for j in range(n):
        d = A[j, j]
        for k in range(j):
            d = d - L[j][k] * L[j][k] * D[k]
        d = jnp.where(jnp.abs(d) < floor, floor, d)
        D[j] = d
        for i in range(j + 1, n):
            s = A[i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k] * D[k]
            L[i][j] = s / d

    # forward solve L z = b
    z = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * z[k]
        z[i] = s
    # diagonal
    y = [z[i] / D[i] for i in range(n)]
    # back solve L^T x = y
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s
    return jnp.stack(x)
