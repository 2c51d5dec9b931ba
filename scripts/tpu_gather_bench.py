"""Microbenchmark: gather/scatter formulations on TPU.

Finds the fastest lowering for x[F] (element gather) and segment_sum
(node scatter-add) at production sizes. Run on the TPU; prints ms per op.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

NP_ = int(sys.argv[1]) if len(sys.argv) > 1 else 160_000
NF = int(sys.argv[2]) if len(sys.argv) > 2 else 307_200
D = 2

rng = np.random.default_rng(0)
F = rng.integers(0, NP_, size=(NF, D + 1)).astype(np.int32)
x2 = jnp.asarray(rng.standard_normal((NP_, D)).astype(np.float32))
x8 = jnp.asarray(rng.standard_normal((NP_, 8)).astype(np.float32))
Fj = jnp.asarray(F)
Fflat = jnp.asarray(F.ravel())
perm = np.argsort(F.ravel(), kind="stable").astype(np.int32)
seg = F.ravel()[perm].astype(np.int32)
permj = jnp.asarray(perm)
segj = jnp.asarray(seg)
vals = jnp.asarray(rng.standard_normal((NF * (D + 1), D)).astype(np.float32))


def _sync(r):
    """block_until_ready is not a reliable fence on the axon backend —
    force a one-element host readback, which must wait for the program."""
    leaf = jax.tree_util.tree_leaves(r)[0]
    return jax.device_get(leaf.ravel()[:1])


def timeit(label, fn, *args, n=30):
    f = jax.jit(fn)
    r = f(*args)
    _sync(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    _sync(r)  # one readback fences the whole enqueued stream
    print(f"  {label:40s} {(time.perf_counter()-t0)/n*1e3:8.2f} ms", flush=True)


print(f"NP={NP_} NF={NF}", flush=True)
timeit("gather x2[F] ([NF,3,2])", lambda x: x[Fj], x2)
timeit("gather flat x2[Fflat]", lambda x: x[Fflat], x2)
timeit("gather x8[F] (8-wide rows)", lambda x: x[Fj], x8)
timeit("take(x2, Fflat, axis=0)", lambda x: jnp.take(x, Fflat, axis=0), x2)
timeit(
    "gather x2 flat-coords (x.ravel()[2i,2i+1])",
    lambda x: jnp.stack(
        [x.ravel()[Fflat * 2], x.ravel()[Fflat * 2 + 1]], axis=-1
    ),
    x2,
)
timeit(
    "segment_sum sorted",
    lambda v: jax.ops.segment_sum(
        v[permj], segj, num_segments=NP_, indices_are_sorted=True
    ),
    vals,
)
timeit(
    "segment_sum unsorted ids",
    lambda v: jax.ops.segment_sum(v, Fflat, num_segments=NP_),
    vals,
)
timeit(
    "scatter-add via .at[].add",
    lambda v: jnp.zeros((NP_, D), jnp.float32).at[Fflat].add(v),
    vals,
)
