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

__all__ = ["build_sharded_epoch_host", "build_sharded_structured_host"]


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
        if jax.default_backend() in ("tpu", "axon"):
            from rgcn_tpu.graph.dynamic import auto_layout_row_block

            row_block = auto_layout_row_block(num_nodes, rows, layout_chunk)
        else:
            # virtual-CPU meshes run the kernels in interpret mode, where
            # the escalated row block's extra one-hot flops are Python-level
            # work — slow enough to trip XLA's 40 s collective-rendezvous
            # termination at FB-toy scale (measured). Keep rb=128 there.
            row_block = 128
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


def build_sharded_structured_host(
    positives: np.ndarray,
    corrupt_head: np.ndarray,
    corrupt_ent: np.ndarray,
    num_nodes: int,
    n_shards: int,
    *,
    row_block: Optional[int] = None,
    chunk: int = 256,
):
    """Per-shard STRUCTURED scoring inputs, stacked leaf-wise.

    The single-device production decoder (3P + Ns query gathers, sorted
    scatter-free backward — `ops/pallas_distmult.py`) sharded over the
    scoring batch: positives split into ``n_shards`` contiguous slices
    (negatives follow their parents), each slice with its own host-built
    sorted structured layouts. Pad parents repeat row 0 with zero loss /
    penalty weight, so per-shard partial losses and gradients sum to the
    exact unsharded values (the decoder fanout-marks its replicated
    inputs; see `rgcn_tpu.nn.layers.DistMult`).

    Returns ``(pos, ch, ce, labels, weights, layouts)`` where every array
    leaf carries a leading ``n_shards`` dimension and ``weights`` is the
    per-row real/pad indicator over each shard's local ``[positives ;
    negatives]`` batch. The caller divides by the REAL total row count.
    """
    if row_block is None:
        # rb=512 is the measured TPU optimum (probe_lp_step); interpret-
        # mode CPU meshes keep rb=128 — see build_sharded_epoch_host.
        row_block = (
            512 if jax.default_backend() in ("tpu", "axon") else 128
        )
    positives = np.asarray(positives)
    corrupt_head = np.asarray(corrupt_head).reshape(-1)
    corrupt_ent = np.asarray(corrupt_ent).reshape(-1)
    p_real = positives.shape[0]
    ns = corrupt_ent.shape[0] // p_real

    p_pad = -(-p_real // n_shards) * n_shards
    if p_pad != p_real:
        extra = p_pad - p_real
        positives = np.concatenate(
            [positives, np.repeat(positives[:1], extra, axis=0)]
        )
        corrupt_head = np.concatenate(
            [corrupt_head, np.zeros(extra * ns, corrupt_head.dtype)]
        )
        corrupt_ent = np.concatenate(
            [corrupt_ent, np.zeros(extra * ns, corrupt_ent.dtype)]
        )
    p_k = p_pad // n_shards

    from rgcn_tpu.ops.pallas_distmult import build_structured_layouts

    shards = []
    for k in range(n_shards):
        sl = slice(k * p_k, (k + 1) * p_k)
        nsl = slice(k * p_k * ns, (k + 1) * p_k * ns)
        pos_k = positives[sl]
        ch_k = corrupt_head[nsl]
        ce_k = corrupt_ent[nsl]
        real_p = np.minimum(
            np.maximum(p_real - k * p_k, 0), p_k
        )  # real parents in this shard (pads are a suffix)
        w_k = np.concatenate(
            [
                (np.arange(p_k) < real_p).astype(np.float32),
                (np.arange(p_k * ns) < real_p * ns).astype(np.float32),
            ]
        )
        labels_k = np.concatenate(
            [np.ones(p_k, np.float32), np.zeros(p_k * ns, np.float32)]
        )
        lays_k = build_structured_layouts(
            pos_k, ce_k, num_nodes, row_block=row_block, chunk=chunk,
            sorted_corrupt=True, corrupt_head=ch_k,
        )
        shards.append((
            pos_k.astype(np.int32), ch_k.astype(bool),
            ce_k.astype(np.int32), labels_k, w_k, lays_k,
        ))
    return jax.tree.map(lambda *xs: np.stack(xs), *shards)
