"""Device mesh construction and edge-partitioned sharding.

Scaling model (new capability — the reference is strictly single-device,
``/root/reference/experiments/classify_nodes.py:46-47``): the relation-sorted
edge tiles of an :class:`EdgeSet` are partitioned across a 1-D ``edge`` mesh
axis. Each chip aggregates its local edges into partial node sums; one
``psum`` over ICI (inserted inside :class:`~rgcn_tpu.nn.layers.RGCNConv` via
``axis_name``) reduces the partials. Node features and weights are
replicated — they are orders of magnitude smaller than the edge list for the
graphs this framework targets. The decoder batch is sharded over the same
axis (data parallelism for scoring).

All communication is XLA collectives through ``shard_map`` — no hand-rolled
transport.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rgcn_tpu.graph.structure import EdgeSet

__all__ = [
    "EDGE_AXIS",
    "make_mesh",
    "shard_edge_set",
    "prepare_sharded_layouts",
]

EDGE_AXIS = "edge"


def make_mesh(
    num_devices: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_name: str = EDGE_AXIS,
) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        if len(devices) < num_devices:
            raise ValueError(
                f"requested {num_devices} devices, have {len(devices)}"
            )
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def shard_edge_set(edges: EdgeSet, mesh: Mesh, axis_name: str = EDGE_AXIS) -> EdgeSet:
    """Place an EdgeSet with tiles distributed across the mesh axis.

    ``edges.num_tiles`` must be divisible by the axis size — build with
    ``tile_multiple=mesh.shape[axis_name]``.
    """
    n_shards = mesh.shape[axis_name]
    if edges.num_tiles % n_shards:
        raise ValueError(
            f"num_tiles ({edges.num_tiles}) not divisible by mesh axis "
            f"{axis_name!r} ({n_shards}); build the EdgeSet with "
            f"tile_multiple={n_shards}"
        )
    edge_sharding = NamedSharding(mesh, P(axis_name))

    def put(x):
        return jax.device_put(x, edge_sharding)

    return EdgeSet(
        src=put(edges.src),
        dst=put(edges.dst),
        rel=put(edges.rel),
        val=put(edges.val),
        tile_rel=put(edges.tile_rel),
        num_nodes=edges.num_nodes,
        num_rels=edges.num_rels,
        tile_size=edges.tile_size,
        num_edges=edges.num_edges,
    )


def prepare_sharded_layouts(
    edges: EdgeSet,
    mesh: Mesh,
    axis_name: str = EDGE_AXIS,
    row_block: int = 256,
) -> EdgeSet:
    """Attach per-shard Pallas destination layouts to a sharded EdgeSet.

    Each device builds the layout + reversed structure for its *local* edge
    slice (the in-jit builders from :mod:`rgcn_tpu.graph.dynamic`, uniform
    static shapes across shards), so the sharded training steps can run the
    Pallas SpMM per shard before the cross-shard ``psum``. Runs once per
    graph; outputs stay sharded along the mesh axis.

    Note: pallas_call under shard_map requires ``check_vma=False`` (no vma
    metadata on kernel outputs; interpret mode additionally rejects mixed
    varying/invariant operands inside kernels). Differentiated shard_maps
    — including sharded *training* through the Pallas kernels — are made
    exact without vma tracking by the manual-AD collectives in
    :mod:`rgcn_tpu.ops.collectives` (``all_reduce``/``fanout``); see
    ``tests/test_dist.py`` for the exactness guarantees.
    """
    import dataclasses
    import functools

    import jax.numpy as jnp
    from jax import shard_map

    from rgcn_tpu.graph.dynamic import (
        _reverse_edge_set_dynamic,
        build_dst_layout_dynamic,
    )

    spec = P(axis_name)

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh, in_specs=(spec,), out_specs=spec,
        check_vma=False
    )
    def build(es_local: EdgeSet) -> EdgeSet:
        layout = build_dst_layout_dynamic(
            es_local.dst, es_local.num_nodes,
            row_block=row_block, chunk=es_local.tile_size,
        )
        rev = _reverse_edge_set_dynamic(
            es_local, row_block, es_local.tile_size
        )
        return dataclasses.replace(es_local, layout=layout, reverse=rev)

    return build(edges)
