"""Build an :class:`EdgeSet` inside ``jit`` from a sampled triple batch.

Link-prediction training samples a fresh positive subgraph every step
(reference ``experiments/predict_links.py:123-148``) and applies general edge
dropout by *physically removing* triples, which would give dynamic shapes.
Here the whole pipeline — inverse generation, edge dropout, relation sort,
degree normalization, relation-bucket tile padding — is expressed as
fixed-shape JAX ops so the entire train step stays inside one compiled
program:

* dropout is a Bernoulli *mask*: dropped edges keep their slot with
  ``val == 0`` and are excluded from the degree counts, matching the
  reference's normalize-after-subsampling behavior;
* an original edge and its generated inverse share one dropout fate, as in
  the reference where inverses are generated from the already-subsampled
  graph (``torch_rgcn/layers.py:481-487``);
* the static padded size is ``ceil((2B + 2R*(T-1)) / T) * T`` — each of the
  ``2R`` relation buckets can waste at most ``T - 1`` slots.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from rgcn_tpu.graph.structure import EdgeSet

__all__ = [
    "padded_size",
    "auto_layout_row_block",
    "build_edge_set_dynamic",
    "build_edge_set_dynamic_host",
    "attach_host_layouts",
    "build_dst_layout_dynamic",
    "self_loop_keep_mask",
]


def _check_sort_key_range(num_general_rels: int, num_nodes: int) -> None:
    """The in-jit (relation, receiver) sorts use an int32 composite key
    ``rel * (N + 1) + dst``; raise (at trace time) for graphs where it
    would overflow instead of silently corrupting the sort."""
    if num_general_rels * (num_nodes + 1) >= 2**31:
        raise ValueError(
            f"(rel, dst) sort key overflows int32: {num_general_rels} "
            f"general relations x {num_nodes} nodes; file an issue — this "
            "needs a two-pass stable sort fallback"
        )


def padded_size(
    num_edges: int,
    num_general_rels: int,
    tile_size: int,
    tile_multiple: int = 1,
) -> int:
    """Static upper bound on the tile-padded edge count."""
    bound = num_edges + num_general_rels * (tile_size - 1)
    out = ((bound + tile_size - 1) // tile_size) * tile_size
    if tile_multiple > 1:
        chunk = tile_size * tile_multiple
        out = ((out + chunk - 1) // chunk) * chunk
    return out


def auto_layout_row_block(
    num_nodes: int,
    num_edges: int,
    chunk: int = 256,
    max_row_block: int = 2048,
) -> int:
    """Pick the aggregation-layout row block for a (sub)graph's size.

    The layout's static slot bound is ``ceil(N / rb) * chunk +
    ceil(E / chunk) * chunk`` — every output row block costs at least one
    chunk, so small subgraphs over large node sets drown in block-minimum
    padding at rb=128 (a 60k-edge WN18 subgraph: 82k pad floor, 57%
    padding; measured −20% on the encoder step at rb=512,
    ``benchmarks/probe_lp_step.py``). Larger row blocks cut the floor but
    grow the kernel's one-hot matmul flops linearly, so escalate only
    while the pad floor exceeds ~35% of the edges. WN18-scale subgraphs
    stop at 512 (the swept production optimum, unchanged); the 2048 cap
    exists for mega-node graphs (N=1M/B=100k: rb=512 left a 250k-slot
    floor ≈ 1.3× the subgraph's edges; 2048 cuts it to ~63k).
    """
    rb = 128
    while rb < max_row_block and (
        -(-num_nodes // rb)
    ) * chunk > 0.35 * max(num_edges, 1):
        rb *= 2
    return rb


def build_edge_set_dynamic(
    positives: jax.Array,
    num_nodes: int,
    num_rels: int,
    tile_size: int = 128,
    *,
    dropout_rate: float = 0.0,
    dropout_key: Optional[jax.Array] = None,
    keep_mask: Optional[jax.Array] = None,  # overrides the dropout draw
    tile_multiple: int = 1,
    with_dst_layout: bool = False,
    with_fused_layout: bool = False,
    row_block: int = 128,  # swept optimum for the aggregation one-hot
) -> EdgeSet:
    """Turn a ``(B, 3)`` positive-triple batch into a padded :class:`EdgeSet`.

    ``num_rels`` is the number of *original* relations ``R``; the result
    stores ``2R`` general relations (originals + inverses). All shapes depend
    only on ``B``, ``R`` and ``tile_size``.
    """
    bsz = positives.shape[0]
    num_general = 2 * num_rels
    e_raw = 2 * bsz
    e_pad = padded_size(e_raw, num_general, tile_size, tile_multiple)
    n_tiles = e_pad // tile_size

    s = positives[:, 0].astype(jnp.int32)
    p = positives[:, 1].astype(jnp.int32)
    o = positives[:, 2].astype(jnp.int32)

    # originals || inverses; receiver = subject, source = object.
    dst = jnp.concatenate([s, o])
    src = jnp.concatenate([o, s])
    rel = jnp.concatenate([p, p + num_rels])

    if keep_mask is not None:
        keep = jnp.asarray(keep_mask, jnp.float32)
    elif dropout_rate > 0.0 and dropout_key is not None:
        keep = jax.random.bernoulli(
            dropout_key, 1.0 - dropout_rate, (bsz,)
        ).astype(jnp.float32)
    else:
        keep = jnp.ones((bsz,), dtype=jnp.float32)
    mask = jnp.concatenate([keep, keep])  # inverse shares its original's fate

    # Sort by (relation, receiver) with ONE argsort on an int32 composite
    # key — a second stable argsort would double the dominant in-jit sort
    # cost. int32 holds the key for any R-GCN-scale graph (AM: 532 * 300k
    # ≈ 1.6e8 << 2^31); the guard below catches the rest at trace time
    # (int64 keys silently truncate without jax_enable_x64).
    _check_sort_key_range(num_general, num_nodes)
    sort_key = rel * jnp.int32(num_nodes + 1) + dst
    order = jnp.argsort(sort_key)
    sort_key = sort_key[order]
    src, dst, rel, mask = src[order], dst[order], rel[order], mask[order]

    # Degree per (rel, dst) group as a run-length computation on sorted keys.
    is_new = jnp.concatenate(
        [
            jnp.ones((1,), jnp.int32),
            (sort_key[1:] != sort_key[:-1]).astype(jnp.int32),
        ]
    )
    seg = jnp.cumsum(is_new) - 1  # group id, < e_raw
    deg = jax.ops.segment_sum(mask, seg, num_segments=e_raw)[seg]
    val = jnp.where(deg > 0, mask / jnp.maximum(deg, 1.0), 0.0)

    # Relation-bucket tile padding.
    counts = jax.ops.segment_sum(
        jnp.ones((e_raw,), jnp.int32), rel, num_segments=num_general
    )
    padded = ((counts + tile_size - 1) // tile_size) * tile_size
    cum_padded = jnp.cumsum(padded)
    offsets = cum_padded - padded  # exclusive cumsum
    cum_counts = jnp.cumsum(counts)
    starts = cum_counts - counts
    pos = offsets[rel] + (jnp.arange(e_raw, dtype=jnp.int32) - starts[rel])

    src_p = jnp.zeros((e_pad,), jnp.int32).at[pos].set(src)
    dst_p = jnp.full((e_pad,), num_nodes, jnp.int32).at[pos].set(dst)
    val_p = jnp.zeros((e_pad,), jnp.float32).at[pos].set(val)

    tile_starts = jnp.arange(n_tiles, dtype=jnp.int32) * tile_size
    tile_rel = jnp.searchsorted(cum_padded, tile_starts, side="right")
    tile_rel = jnp.minimum(tile_rel, num_general - 1).astype(jnp.int32)
    rel_p = jnp.repeat(tile_rel, tile_size)

    es = EdgeSet(
        src=src_p,
        dst=dst_p,
        rel=rel_p,
        val=val_p,
        tile_rel=tile_rel,
        num_nodes=int(num_nodes),
        num_rels=int(num_general),
        tile_size=int(tile_size),
        num_edges=int(e_raw),
    )
    if with_dst_layout:
        import dataclasses

        layout = build_dst_layout_dynamic(
            dst_p, num_nodes, row_block=row_block, chunk=tile_size
        )
        rev = _reverse_edge_set_dynamic(es, row_block, tile_size)
        es = dataclasses.replace(es, layout=layout, reverse=rev)
        if with_fused_layout:
            # Opt-in, for dense-weight per-step graphs only. Every shipped
            # LP config decomposes its weights (WN18: basis — served by the
            # aggregation-first kernel over the plain dst layout above,
            # ops/pallas_basis.py; FB-toy: block — XLA messages + Pallas
            # aggregation), so the relation-quantum fused layout is not on
            # the default training path; its in-jit build also inflates
            # compile time substantially on remote-compile backends.
            from rgcn_tpu.ops.pallas_fused import build_fused_layout_dynamic

            q = min(16, tile_size)
            fused = build_fused_layout_dynamic(
                es, row_block=row_block, chunk=tile_size, quantum=q
            )
            rev = dataclasses.replace(
                rev,
                fused=build_fused_layout_dynamic(
                    rev, row_block=row_block, chunk=tile_size, quantum=q
                ),
            )
            es = dataclasses.replace(es, reverse=rev, fused=fused)
    return es


def build_dst_layout_dynamic(
    dst: jax.Array,
    num_nodes: int,
    row_block: int = 128,  # swept optimum: one-hot flops scale with rb
    chunk: int = 256,
    src: Optional[jax.Array] = None,
):
    """In-jit destination-sorted aggregation layout (see
    :class:`rgcn_tpu.ops.pallas_aggregate.DstLayout` for semantics).

    ``dst`` is the padded per-edge destination array of an :class:`EdgeSet`
    (pads carry ``dst == num_nodes``). All output shapes depend only on
    ``len(dst)``, ``num_nodes``, ``row_block`` and ``chunk``.

    ``src``: optional per-edge sources. When given (and the composite sort
    key fits int32), edges are ordered by source within each destination
    row block — the split-gather fast-path prerequisite, mirroring the
    host builder (:func:`rgcn_tpu.ops.pallas_aggregate.build_dst_layout`).
    Larger graphs silently keep the plain destination order (correct
    either way; the one-hot accepts any within-block order).
    """
    from rgcn_tpu.ops.pallas_aggregate import DstLayout

    e_pad = dst.shape[0]
    num_row_blocks = -(-num_nodes // row_block)
    # every block gets >= 1 chunk; each can waste at most chunk-1 slots
    total = num_row_blocks * chunk + ((e_pad + chunk - 1) // chunk) * chunk
    n_chunks = total // chunk

    if src is not None and (num_row_blocks + 1) * (num_nodes + 1) < 2**31:
        # (row block, source) composite int32 key; pads (dst == num_nodes)
        # get block id num_row_blocks so they still sort strictly last
        blk = jnp.where(
            dst >= num_nodes, num_row_blocks, dst // row_block
        ).astype(jnp.int32)
        key = blk * jnp.int32(num_nodes + 1) + jnp.where(
            dst >= num_nodes, num_nodes, src
        ).astype(jnp.int32)
        order = jnp.argsort(key)
    else:
        order = jnp.argsort(dst)  # pads (== num_nodes) sort last
    dst_sorted = dst[order]
    real = dst_sorted < num_nodes
    block_of = jnp.minimum(dst_sorted // row_block, num_row_blocks - 1)

    counts = jax.ops.segment_sum(
        real.astype(jnp.int32), block_of, num_segments=num_row_blocks
    )
    padded = jnp.maximum((counts + chunk - 1) // chunk, 1) * chunk
    cum_padded = jnp.cumsum(padded)
    offsets = cum_padded - padded
    cum_counts = jnp.cumsum(counts)
    starts = cum_counts - counts

    rank = jnp.arange(e_pad, dtype=jnp.int32) - starts[block_of]
    pos = jnp.where(real, offsets[block_of] + rank, total)  # pads dropped

    perm = jnp.full((total,), e_pad, jnp.int32).at[pos].set(
        order.astype(jnp.int32), mode="drop"
    )
    local = jnp.full((total,), row_block, jnp.int32).at[pos].set(
        (dst_sorted - block_of * row_block).astype(jnp.int32), mode="drop"
    )

    chunk_starts = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    chunk_block = jnp.searchsorted(cum_padded, chunk_starts, side="right")
    chunk_block = jnp.minimum(chunk_block, num_row_blocks - 1).astype(jnp.int32)

    return DstLayout(
        perm=perm,
        local_dst=local.reshape(n_chunks, chunk),
        chunk_block=chunk_block,
        num_row_blocks=int(num_row_blocks),
        row_block=int(row_block),
        chunk=int(chunk),
    )


def _reverse_edge_set_dynamic(es: EdgeSet, row_block: int, chunk: int) -> EdgeSet:
    """Transpose an in-jit EdgeSet (swap src/dst, KEEP values) and re-tile by
    (relation, new receiver). Pad slots keep val == 0 and ride along."""
    e_pad = es.src.shape[0]
    num_general = es.num_rels
    n = es.num_nodes
    tile = es.tile_size

    new_dst, new_src = es.src, es.dst
    rel, val = es.rel, es.val

    # (relation, receiver) sort via one int32-key argsort (guarded; see
    # build_edge_set_dynamic).
    _check_sort_key_range(num_general, n)
    order = jnp.argsort(rel * jnp.int32(n + 1) + new_dst)
    new_src, new_dst = new_src[order], new_dst[order]
    rel, val = rel[order], val[order]

    # pads already occupy slots; relation buckets only need rounding
    counts = jax.ops.segment_sum(
        jnp.ones((e_pad,), jnp.int32), rel, num_segments=num_general
    )
    padded = ((counts + tile - 1) // tile) * tile
    e_rev = padded_size(e_pad, num_general, tile)
    cum_padded = jnp.cumsum(padded)
    offsets = cum_padded - padded
    cum_counts = jnp.cumsum(counts)
    starts = cum_counts - counts
    pos = offsets[rel] + (jnp.arange(e_pad, dtype=jnp.int32) - starts[rel])

    src_p = jnp.zeros((e_rev,), jnp.int32).at[pos].set(new_src)
    dst_p = jnp.full((e_rev,), n, jnp.int32).at[pos].set(new_dst)
    val_p = jnp.zeros((e_rev,), jnp.float32).at[pos].set(val)

    n_tiles = e_rev // tile
    tile_starts = jnp.arange(n_tiles, dtype=jnp.int32) * tile
    tile_rel = jnp.searchsorted(cum_padded, tile_starts, side="right")
    tile_rel = jnp.minimum(tile_rel, num_general - 1).astype(jnp.int32)
    rel_p = jnp.repeat(tile_rel, tile)

    layout = build_dst_layout_dynamic(dst_p, n, row_block, chunk)
    return EdgeSet(
        src=src_p, dst=dst_p, rel=rel_p, val=val_p, tile_rel=tile_rel,
        num_nodes=n, num_rels=num_general, tile_size=tile,
        num_edges=es.num_edges, layout=layout,
    )


def self_loop_keep_mask(
    key: Optional[jax.Array],
    num_nodes: int,
    keep_prob: float,
) -> jax.Array:
    """Per-node Bernoulli keep mask for self-loop edge dropout.

    Mirrors the mask in ``generate_self_loops``
    (``torch_rgcn/utils.py:110-124``); returned as ``(N, 1)`` floats so it
    broadcasts over the dense self-loop message ``X @ W_self``.
    """
    if key is None or keep_prob >= 1.0:
        return jnp.ones((num_nodes, 1), jnp.float32)
    return jax.random.bernoulli(key, keep_prob, (num_nodes, 1)).astype(
        jnp.float32
    )


def _host_lexsort_rel_dst(rel, dst, num_general: int, num_nodes: int):
    """``np.lexsort((dst, rel))`` with the native counting-sort fast path
    (bit-identical; see ``native/layout_builder.cc``). ``dst`` may contain
    the pad value ``num_nodes``."""
    import numpy as np

    from rgcn_tpu.graph.native import lexsort_rel_dst

    order = lexsort_rel_dst(rel, dst, num_general, num_nodes + 1)
    if order is not None:
        return order
    return np.lexsort((dst, rel))


def build_edge_set_dynamic_host(
    positives: "np.ndarray",
    num_nodes: int,
    num_rels: int,
    tile_size: int = 128,
    *,
    dropout_rate: float = 0.0,
    dropout_rng: Optional["np.random.Generator"] = None,
    keep_mask: Optional["np.ndarray"] = None,
    tile_multiple: int = 1,
    with_dst_layout: bool = False,
    row_block: int = 128,
    layout_chunk: int = 256,
) -> EdgeSet:
    """Host-side (NumPy) mirror of :func:`build_edge_set_dynamic`.

    Same contract and identical static shapes; intended for the training
    loop's background epoch pipeline: link-prediction runs ONE step per
    sampled subgraph, so the entire graph construction — dropout masking,
    (relation, receiver) sort, degree renormalization, tile padding and the
    Pallas destination layouts for forward AND reverse — can overlap with
    the previous step's device execution instead of burning device time on
    in-jit sorts and scatters (measured ~35 ms of a 43 ms WN18-scale step).

    ``keep_mask`` (bool, per positive) overrides the dropout draw — used by
    the equivalence tests; otherwise ``dropout_rng`` draws it.
    """
    import numpy as np

    positives = np.asarray(positives)
    bsz = positives.shape[0]
    num_general = 2 * num_rels
    e_raw = 2 * bsz
    e_pad = padded_size(e_raw, num_general, tile_size, tile_multiple)
    n_tiles = e_pad // tile_size

    s = positives[:, 0].astype(np.int32)
    p = positives[:, 1].astype(np.int32)
    o = positives[:, 2].astype(np.int32)

    dst = np.concatenate([s, o])
    src = np.concatenate([o, s])
    rel = np.concatenate([p, p + num_rels])

    if keep_mask is not None:
        keep = np.asarray(keep_mask, dtype=np.float32)
    elif dropout_rate > 0.0 and dropout_rng is not None:
        keep = (dropout_rng.random(bsz) < 1.0 - dropout_rate).astype(
            np.float32
        )
    else:
        keep = np.ones(bsz, dtype=np.float32)
    mask = np.concatenate([keep, keep])

    order = _host_lexsort_rel_dst(rel, dst, num_general, num_nodes)
    src, dst, rel, mask = src[order], dst[order], rel[order], mask[order]

    key = rel.astype(np.int64) * (num_nodes + 1) + dst
    is_new = np.concatenate([[True], key[1:] != key[:-1]])
    seg = np.cumsum(is_new) - 1
    deg = np.zeros(e_raw, dtype=np.float64)
    np.add.at(deg, seg, mask)
    deg = deg[seg]
    val = np.where(deg > 0, mask / np.maximum(deg, 1.0), 0.0).astype(
        np.float32
    )

    counts = np.bincount(rel, minlength=num_general)
    padded = ((counts + tile_size - 1) // tile_size) * tile_size
    cum_padded = np.cumsum(padded)
    offsets = cum_padded - padded
    cum_counts = np.cumsum(counts)
    starts = cum_counts - counts
    pos = offsets[rel] + (np.arange(e_raw) - starts[rel])

    src_p = np.zeros(e_pad, dtype=np.int32)
    dst_p = np.full(e_pad, num_nodes, dtype=np.int32)
    val_p = np.zeros(e_pad, dtype=np.float32)
    src_p[pos] = src
    dst_p[pos] = dst
    val_p[pos] = val

    tile_starts = np.arange(n_tiles, dtype=np.int64) * tile_size
    tile_rel = np.searchsorted(cum_padded, tile_starts, side="right")
    tile_rel = np.minimum(tile_rel, num_general - 1).astype(np.int32)
    rel_p = np.repeat(tile_rel, tile_size)

    es = EdgeSet(
        src=src_p, dst=dst_p, rel=rel_p, val=val_p, tile_rel=tile_rel,
        num_nodes=int(num_nodes), num_rels=int(num_general),
        tile_size=int(tile_size), num_edges=int(e_raw),
    )
    if not with_dst_layout:
        return es
    return attach_host_layouts(
        es, row_block=row_block, layout_chunk=layout_chunk
    )


def attach_host_layouts(
    es: EdgeSet,
    row_block: int = 128,
    layout_chunk: int = 256,
) -> EdgeSet:
    """Attach the (shape-stable) destination layout + reversed structure to
    a host-built EdgeSet — also used per shard slice by the sharded host
    pipeline (:mod:`rgcn_tpu.dist`)."""
    import dataclasses

    from rgcn_tpu.ops.pallas_aggregate import build_dst_layout

    import numpy as np

    num_nodes = es.num_nodes
    num_general = es.num_rels
    tile_size = es.tile_size
    src_p = np.asarray(es.src)
    dst_p = np.asarray(es.dst)
    rel_p = np.asarray(es.rel)
    val_p = np.asarray(es.val)
    e_pad = src_p.shape[0]

    nrb = -(-num_nodes // row_block)
    static_total = nrb * layout_chunk + (
        (e_pad + layout_chunk - 1) // layout_chunk
    ) * layout_chunk
    layout = build_dst_layout(
        dst_p, num_nodes, row_block=row_block, chunk=layout_chunk,
        pad_to=static_total,
    )

    # reverse: swap src/dst, KEEP values, re-tile by (relation, receiver) —
    # mirrors _reverse_edge_set_dynamic (pads ride along with val == 0)
    r_dst, r_src = src_p, dst_p
    r_order = _host_lexsort_rel_dst(rel_p, r_dst, num_general, num_nodes)
    r_src_s, r_dst_s = r_src[r_order], r_dst[r_order]
    r_rel_s, r_val_s = rel_p[r_order], val_p[r_order]

    r_counts = np.bincount(r_rel_s, minlength=num_general)
    r_padded = ((r_counts + tile_size - 1) // tile_size) * tile_size
    e_rev = padded_size(e_pad, num_general, tile_size)
    r_cum = np.cumsum(r_padded)
    r_off = r_cum - r_padded
    r_cc = np.cumsum(r_counts)
    r_st = r_cc - r_counts
    r_pos = r_off[r_rel_s] + (np.arange(e_pad) - r_st[r_rel_s])

    rsrc_p = np.zeros(e_rev, dtype=np.int32)
    rdst_p = np.full(e_rev, num_nodes, dtype=np.int32)
    rval_p = np.zeros(e_rev, dtype=np.float32)
    rsrc_p[r_pos] = r_src_s
    rdst_p[r_pos] = r_dst_s
    rval_p[r_pos] = r_val_s

    rn_tiles = e_rev // tile_size
    r_ts = np.arange(rn_tiles, dtype=np.int64) * tile_size
    r_tile_rel = np.searchsorted(r_cum, r_ts, side="right")
    r_tile_rel = np.minimum(r_tile_rel, num_general - 1).astype(np.int32)
    r_rel_p = np.repeat(r_tile_rel, tile_size)

    r_static_total = nrb * layout_chunk + (
        (e_rev + layout_chunk - 1) // layout_chunk
    ) * layout_chunk
    r_layout = build_dst_layout(
        rdst_p, num_nodes, row_block=row_block, chunk=layout_chunk,
        pad_to=r_static_total,
    )
    rev = EdgeSet(
        src=rsrc_p, dst=rdst_p, rel=r_rel_p, val=rval_p,
        tile_rel=r_tile_rel, num_nodes=int(num_nodes),
        num_rels=num_general, tile_size=int(tile_size),
        num_edges=es.num_edges, layout=r_layout,
    )
    return dataclasses.replace(es, layout=layout, reverse=rev)
