"""Microbenchmark: 3D frozen-cell gather layouts on TPU.

The 3D prox hot loop freezes 8 corner tensors (9 f32 each) + 6 bounds per
vertex. The general (non-constant-monitor) path today performs 8 narrow
gathers from the [nz+1, ny+1, nx+1, 9] grid per vertex. Candidate
redesigns pack the per-cell data (8 corners x 6 symmetric entries + 6
bounds = 54 f32) into a flat cell table so each vertex needs 1-4 WIDE row
gathers instead. 2D measurements showed a row-gather cost cliff above
16 f32/row; this probe decides the 3D layout:

  (a) 8 narrow [*, 9] gathers        — current general path
  (b) 1  wide  [*, 64] gather        — single padded row
  (c) 4x       [*, 16] gathers       — strip layout under the cliff
  (d) 1  wide  [*, 54] gather        — unpadded row

Sized for 3DMonitor240 (768,000 tets, 3.07M vertex indices, 73^3 cells).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

NCELLS = int(sys.argv[1]) if len(sys.argv) > 1 else 73**3
NIDX = int(sys.argv[2]) if len(sys.argv) > 2 else 768_000 * 4

rng = np.random.default_rng(0)
ids = jnp.asarray(rng.integers(0, NCELLS, size=NIDX).astype(np.int32))
n_side = round(NCELLS ** (1 / 3))


def _sync(r):
    leaf = jax.tree_util.tree_leaves(r)[0]
    return jax.device_get(leaf.ravel()[:1])


def timeit(label, fn, *args, n=30):
    f = jax.jit(fn)
    r = f(*args)
    _sync(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    _sync(r)
    print(f"  {label:46s} {(time.perf_counter()-t0)/n*1e3:8.2f} ms",
          flush=True)


A = jnp.asarray(rng.standard_normal((4096, 4096)), dtype=jnp.bfloat16)
timeit("sanity bf16 4096^3 matmul (0.14 TFLOP)", lambda a: a @ a, A)

# (a) current general path: 8 narrow gathers from the grid values tensor
gridv = jnp.asarray(
    rng.standard_normal(((n_side + 1) ** 3, 9)).astype(np.float32)
)
zi = jnp.asarray(rng.integers(0, n_side, size=NIDX).astype(np.int32))
yi = jnp.asarray(rng.integers(0, n_side, size=NIDX).astype(np.int32))
xi = jnp.asarray(rng.integers(0, n_side, size=NIDX).astype(np.int32))
s = n_side + 1


def narrow8(g, zi, yi, xi):
    base = (zi * s + yi) * s + xi
    outs = [
        g[base], g[base + 1], g[base + s], g[base + s + 1],
        g[base + s * s], g[base + s * s + 1],
        g[base + s * s + s], g[base + s * s + s + 1],
    ]
    return jnp.concatenate(outs, axis=-1)


timeit(f"(a) 8x narrow [{s**3},9] gathers", narrow8, gridv, zi, yi, xi)

for width, label in ((64, "(b) 1x wide"), (54, "(d) 1x wide")):
    tbl = jnp.asarray(
        rng.standard_normal((NCELLS, width)).astype(np.float32)
    )
    timeit(f"{label} [{NCELLS},{width}] gather", lambda t, i: t[i], tbl, ids)

tbl4 = jnp.asarray(
    rng.standard_normal((4, NCELLS, 16)).astype(np.float32)
)


def strips4(t, i):
    return jnp.concatenate([t[0][i], t[1][i], t[2][i], t[3][i]], axis=-1)


timeit(f"(c) 4x [{NCELLS},16] strip gathers", strips4, tbl4, ids)

# bounds-free variant: bounds computed from the cell id (uniform grid!)
# leaves 48 payload f32 -> 3x16 strips
tbl3 = jnp.asarray(
    rng.standard_normal((3, NCELLS, 16)).astype(np.float32)
)


def strips3(t, i):
    return jnp.concatenate([t[0][i], t[1][i], t[2][i]], axis=-1)


timeit(f"(e) 3x [{NCELLS},16] strip gathers", strips3, tbl3, ids)
