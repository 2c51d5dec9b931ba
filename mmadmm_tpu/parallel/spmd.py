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
    per-shard plan per row (leading axis = shard index)."""

    F: jax.Array  # [NFp, D+1] int32
    xi: jax.Array  # [NFp, D+1, D]
    elem_free: jax.Array  # [NFp, D+1, D] 1.0 where movable
    valid: jax.Array  # [NFp] 1.0 for real elements, 0.0 for padding
    perm: jax.Array  # [S, L*(D+1)] int32, L = NFp // S
    seg: jax.Array  # [S, L*(D+1)] int32
    dense_idx: jax.Array | None  # [S, NP, K] degree-padded plan (2D only)

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

    # degree-padded per-shard gather plans (2D: K is small; 3D's K x NP x S
    # table would be too large, segment_sum is used instead)
    dense_idx = None
    D = xi.shape[-1]
    if D == 2:
        from ..geometry.topology import dense_scatter_plan

        plans = []
        for s in range(n_shards):
            idx, _ = dense_scatter_plan(F_o[s * L : (s + 1) * L], n_pnts)
            plans.append(idx)
        K = max(p.shape[1] for p in plans)
        stacked = np.full((n_shards, n_pnts, K), L * dp1, dtype=np.int32)
        for s, p in enumerate(plans):
            stacked[s, :, : p.shape[1]] = p
        dense_idx = jnp.asarray(stacked)

    return ElemShards(
        F=jnp.asarray(F_o.astype(np.int32)),
        xi=jnp.asarray(xi_o, dtype=dtype),
        elem_free=jnp.asarray(free_o, dtype=dtype),
        valid=jnp.asarray(valid, dtype=dtype),
        perm=jnp.asarray(perms),
        seg=jnp.asarray(segs),
        dense_idx=dense_idx,
    )
