"""Multi-device SPMD layer: element-axis domain decomposition.

The reference's only parallelism is an OpenMP ``parallel for`` over elements
inside one address space (``src/Mesh.cpp:945-948``). Here the element batch
is sharded across a ``jax.sharding.Mesh`` axis (``"elems"``) with
``shard_map``: the prox z-update and dual update are embarrassingly parallel
per shard; node-field assembly (``D^T``) is a per-shard partial
``segment_sum`` followed by one ``psum`` over the axis — the domain analogue
of a data-parallel gradient all-reduce, riding ICI.
"""

from .spmd import ElemShards, make_device_mesh

__all__ = ["ElemShards", "make_device_mesh"]
