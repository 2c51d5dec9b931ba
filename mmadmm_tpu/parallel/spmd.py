"""Element-shard construction + device-mesh helpers.

Shards are built host-side at setup (NumPy): elements are reordered by
recursive coordinate bisection (``geometry.topology.partition_elements``) so
contiguous shards are spatially compact, padded to a multiple of the shard
count with copies of element 0 carrying ``valid = 0`` weights, and each
shard gets its own sorted scatter plan (node-sorted ``segment_sum`` layout).

This replaces what a distributed rebuild of the reference would have needed
from METIS + MPI; the reference itself has no partitioner (SURVEY §2.3).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax


class ElemShards(NamedTuple):
    """Global padded element arrays, partition-ordered. Leading axis NFp is
    sharded over the ``"elems"`` mesh axis; ``perm``/``seg`` carry one
    per-shard plan per row (leading axis = shard index).

    The halo plan (``shared_ids``/``is_shared``/``shared_slot``/``contrib``)
    supports the owner-computes ADMM step (SURVEY §7 "halo-consistent
    ADMM"): nodes touched by >= 2 shards form the SHARED cut set C; inside
    the ADMM loop only the [C, D] partial-sum buffer is all-reduced
    (O(cut) per iteration instead of the full [NP, D] field), private
    nodes being complete locally; the replicated x is rebuilt once per
    outer step from the per-shard ownership mask ``contrib`` (exactly one
    owner per node)."""

    F: jax.Array  # [NFp, D+1] int32
    xi: jax.Array  # [NFp, D+1, D]
    elem_free: jax.Array  # [NFp, D+1, D] 1.0 where movable
    valid: jax.Array  # [NFp] 1.0 for real elements, 0.0 for padding
    perm: jax.Array  # [S, L*(D+1)] int32, L = NFp // S
    seg: jax.Array  # [S, L*(D+1)] int32
    dense_idx: jax.Array | None  # [S, NP, K] degree-padded plan
    shared_ids: jax.Array  # [C] int32 — node ids touched by >= 2 shards
    is_shared: jax.Array  # [NP] f32 1.0 on shared nodes
    shared_slot: jax.Array  # [NP] int32 — index into C, C for private
    contrib: jax.Array  # [S, NP] f32 — 1.0 where this shard owns the node

    @property
    def n_shards(self) -> int:
        return self.perm.shape[0]


def make_device_mesh(n_devices: int | None = None, devices=None):
    """1-D device mesh over the ``"elems"`` axis."""
    from jax.sharding import Mesh

    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("elems",))


def put_global(arr, device_mesh, spec):
    """Commit ``arr`` to ``NamedSharding(device_mesh, spec)``.

    Single-process: plain ``device_put``. Multi-process (after
    ``initialize_multihost``): every process holds the full logical array
    (setup is deterministic host-side NumPy), so each process donates its
    addressable shards via ``make_array_from_callback`` — the standard way
    to form a global jax.Array without shipping remote shards."""
    from jax.sharding import NamedSharding

    sharding = NamedSharding(device_mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(arr, sharding)

    def _commit(leaf):
        host = np.asarray(leaf)
        return jax.make_array_from_callback(
            host.shape, sharding, lambda idx: host[idx]
        )

    return jax.tree_util.tree_map(_commit, arr)


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
):
    """Bring up JAX's multi-host runtime for pod-slice execution.

    On TPU pods the arguments are auto-detected from the environment; pass
    them explicitly for CPU/GPU clusters. After this, ``jax.devices()``
    spans all hosts and the ``"elems"`` mesh axis in ``make_device_mesh``
    shards globally (collectives ride ICI within a slice, DCN across
    slices). The reference has no equivalent — its only cluster usage is
    SLURM arrays of independent processes (SURVEY §2.3)."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_index(), jax.process_count()


def build_elem_shards(
    X: np.ndarray,
    F: np.ndarray,
    xi: np.ndarray,
    elem_free: np.ndarray,
    n_pnts: int,
    n_shards: int,
    dtype,
) -> ElemShards:
    """Partition-order, pad, and plan the element batch for ``n_shards``."""
    import jax.numpy as jnp

    from ..geometry.topology import partition_elements

    nf = F.shape[0]
    order = (
        partition_elements(X, F, n_shards) if n_shards > 1 else np.arange(nf)
    )
    F_o = F[order]
    xi_o = xi[order]
    free_o = elem_free[order]

    L = -(-nf // n_shards)  # ceil
    nfp = L * n_shards
    pad = nfp - nf
    valid = np.ones(nfp, dtype=np.float64)
    if pad:
        F_o = np.concatenate([F_o, np.repeat(F_o[:1], pad, axis=0)])
        xi_o = np.concatenate([xi_o, np.repeat(xi_o[:1], pad, axis=0)])
        free_o = np.concatenate([free_o, np.repeat(free_o[:1], pad, axis=0)])
        valid[nf:] = 0.0

    dp1 = F.shape[1]
    perms = np.empty((n_shards, L * dp1), dtype=np.int32)
    segs = np.empty((n_shards, L * dp1), dtype=np.int32)
    for s in range(n_shards):
        flat = F_o[s * L : (s + 1) * L].ravel()
        p = np.argsort(flat, kind="stable").astype(np.int32)
        perms[s] = p
        segs[s] = flat[p]

    # degree-padded per-shard gather plans. Used for 2D and 3D alike (the
    # single-device path already uses the dense plan in 3D; node degree in
    # a tet mesh is larger but bounded), gated by total table size — the
    # S x NP x K int32 table replicates NP per shard, so very fine meshes
    # on many shards fall back to the sorted segment_sum path.
    dense_idx = None
    from ..geometry.topology import dense_scatter_plan

    plans = []
    for s in range(n_shards):
        idx, _ = dense_scatter_plan(F_o[s * L : (s + 1) * L], n_pnts)
        plans.append(idx)
    K = max(p.shape[1] for p in plans)
    if n_shards * n_pnts * K * 4 < 2**29:  # 512 MB gate
        stacked = np.full((n_shards, n_pnts, K), L * dp1, dtype=np.int32)
        for s, p in enumerate(plans):
            stacked[s, :, : p.shape[1]] = p
        dense_idx = jnp.asarray(stacked)

    # ---- halo plan: shared cut set + per-node ownership -------------
    # "touched" includes padding rows (copies of element 0): those shards
    # READ element-0's node coordinates too, so its nodes must carry
    # reduced values wherever padding lives.
    touch = np.zeros((n_shards, n_pnts), dtype=bool)
    for s in range(n_shards):
        touch[s, np.unique(F_o[s * L : (s + 1) * L])] = True
    count = touch.sum(axis=0)
    shared = count >= 2
    shared_ids = np.nonzero(shared)[0].astype(np.int32)
    n_c = shared_ids.shape[0]
    shared_slot = np.full(n_pnts, n_c, dtype=np.int32)
    shared_slot[shared_ids] = np.arange(n_c, dtype=np.int32)
    # owner = lowest shard touching the node (shard 0 for untouched ones,
    # which then reproduces the zero-contribution x-update row exactly)
    owner = np.where(
        count > 0, np.argmax(touch, axis=0), 0
    ).astype(np.int32)
    contrib = np.zeros((n_shards, n_pnts), dtype=np.float64)
    contrib[owner, np.arange(n_pnts)] = 1.0

    return ElemShards(
        F=jnp.asarray(F_o.astype(np.int32)),
        xi=jnp.asarray(xi_o, dtype=dtype),
        elem_free=jnp.asarray(free_o, dtype=dtype),
        valid=jnp.asarray(valid, dtype=dtype),
        perm=jnp.asarray(perms),
        seg=jnp.asarray(segs),
        dense_idx=dense_idx,
        shared_ids=jnp.asarray(shared_ids),
        is_shared=jnp.asarray(shared.astype(np.float64), dtype=dtype),
        shared_slot=jnp.asarray(shared_slot),
        contrib=jnp.asarray(contrib, dtype=dtype),
    )
