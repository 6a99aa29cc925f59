"""Host-side epoch pipeline for the sharded training steps.

Mirrors the single-device production path (graph + Pallas layouts built on
the host, overlapped with device execution) for multi-chip training: the
tile-padded EdgeSet is built once, sliced into per-shard tile ranges, and
each slice gets its own destination layout + reversed structure
(:func:`rgcn_tpu.graph.dynamic.attach_host_layouts`) — exactly what the
in-shard_map traced builder produces, without spending device time on
sorts. The per-shard structures are stacked leaf-wise so ``shard_map``
in_specs can split them over the edge axis.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from rgcn_tpu.graph.dynamic import (
    attach_host_layouts,
    build_edge_set_dynamic_host,
)
from rgcn_tpu.graph.structure import EdgeSet

__all__ = ["build_sharded_epoch_host"]


def build_sharded_epoch_host(
    positives: np.ndarray,
    num_nodes: int,
    num_rels: int,
    tile_size: int,
    n_shards: int,
    *,
    dropout_rate: float = 0.0,
    dropout_rng=None,
    keep_mask: Optional[np.ndarray] = None,
    row_block: Optional[int] = None,
    layout_chunk: int = 256,
) -> EdgeSet:
    """Per-shard EdgeSets (with layouts + reverse) stacked leaf-wise:
    every pytree leaf has a leading ``n_shards`` dimension for
    ``in_specs=P(edge_axis)`` splitting.

    ``row_block=None`` picks the layout row block per the subgraph-size
    heuristic (:func:`rgcn_tpu.graph.dynamic.auto_layout_row_block`) from
    the PER-SHARD edge count — shard slices cover all ``num_nodes`` but
    only ``E / n_shards`` edges, so the block-minimum pad floor bites
    even harder than single-device. All shards share one edge count, so
    the choice (and therefore the stacked leaf shapes) is uniform."""
    es = build_edge_set_dynamic_host(
        positives, num_nodes, num_rels, tile_size=tile_size,
        dropout_rate=dropout_rate, dropout_rng=dropout_rng,
        keep_mask=keep_mask, tile_multiple=n_shards,
        with_dst_layout=False,
    )
    rows = es.src.shape[0] // n_shards
    if row_block is None:
        from rgcn_tpu.graph.dynamic import auto_layout_row_block

        row_block = auto_layout_row_block(num_nodes, rows, layout_chunk)
    tiles = es.tile_rel.shape[0] // n_shards

    shards = []
    for k in range(n_shards):
        sl = slice(k * rows, (k + 1) * rows)
        es_k = EdgeSet(
            src=es.src[sl], dst=es.dst[sl], rel=es.rel[sl], val=es.val[sl],
            tile_rel=es.tile_rel[k * tiles : (k + 1) * tiles],
            num_nodes=es.num_nodes, num_rels=es.num_rels,
            tile_size=es.tile_size, num_edges=es.num_edges,
        )
        shards.append(
            attach_host_layouts(
                es_k, row_block=row_block, layout_chunk=layout_chunk
            )
        )
    return jax.tree.map(lambda *xs: np.stack(xs), *shards)
