"""Relational SpMM: the one message-passing primitive.

The reference implements four message-passing codepaths — featureless,
diagonal, vertically stacked, horizontally stacked
(``/root/reference/torch_rgcn/layers.py:286-301,518-551``) — that are all the
same mathematical operation once the normalization reorder is folded in:

    out[d] = sum_{e : dst_e = d} val_e * (X[src_e] @ W[rel_e])

This module provides that operation over a relation-sorted, tile-padded
:class:`~rgcn_tpu.graph.structure.EdgeSet`, in four *weight layouts* (dense
per-relation, per-relation diagonal, block-diagonal, and featureless/identity
features), all sharing one aggregation path.

TPU mapping
-----------
* Message computation is a batched matmul over relation-uniform tiles:
  ``einsum('tbi,tio->tbo', X[src]​tiles, W[tile_rel])`` — dense MXU work; the
  weight gather is amortized per tile, not per edge.
* Aggregation is a ``segment_sum`` scatter-add into ``num_nodes + 1`` rows
  (the last row swallows padding) — receivers are sorted within each
  relation segment which keeps the scatter mostly-monotonic.
* Everything is static-shape; dropped/padding edges carry ``val == 0``.

A Pallas fused kernel for the same contract lives in
:mod:`rgcn_tpu.ops.pallas_spmm`; this XLA implementation is the portable
reference path and the correctness oracle.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from rgcn_tpu.graph.structure import EdgeSet

__all__ = [
    "aggregate_messages",
    "rel_spmm",
    "rel_spmm_diag",
    "rel_spmm_block",
    "rel_spmm_featureless",
    "rel_spmm_featureless_basis",
    "rel_spmm_basis_pairs",
]

# Cap on the gathered-rows intermediate (elements) of the featureless
# basis contraction; above it, tile groups run under jax.checkpoint.
# Module-level so tests can exercise the grouped path on small graphs.
_ELEM_BUDGET = 64_000_000
# The pair paths dedup the intermediate ~2.5x AND the lax.map grouping
# measured ~600 ms of overhead at AM scale (l1 fwd 727 ms grouped vs
# ~115 ms composed ungrouped pieces, probe_stress_nc round 4). Round 10:
# AM's LAYER 2 (592k pairs × 40 bases × 11 classes ≈ 260M elements) sat
# just over the old 256M cap and rode the serialized checkpoint groups —
# missing the GEMM contraction, post-gather barrier, and dt-layout
# backward; raising the cap measured the full step 164.7 vs 186.0 ms
# interleaved (canary-quiet, probe_stress_nc --ab agg,agg_big). 512M
# (~1 GB bf16 / 2 GB f32 per intermediate, a few resident at once in
# AD) keeps comfortable headroom on a 16 GB chip; true stress scales
# still group.
_PAIR_ELEM_BUDGET = 512_000_000


def aggregate_messages(
    messages: jax.Array, dst: jax.Array, num_nodes: int
) -> jax.Array:
    """Scatter-add per-edge messages ``(E, dout)`` into node rows ``(N, dout)``.

    Padding edges target row ``num_nodes`` which is sliced off.
    """
    out = jax.ops.segment_sum(messages, dst, num_segments=num_nodes + 1)
    return out[: num_nodes]


def rel_spmm(
    edges: EdgeSet,
    x: jax.Array,
    weights: jax.Array,
    *,
    precision: Optional[jax.lax.Precision] = None,
) -> jax.Array:
    """Dense-weight relational SpMM.

    Args:
      edges: tile-padded general edges (``num_rels`` relations).
      x: node features ``(N, din)`` (an extra trailing pad row is tolerated).
      weights: ``(num_rels, din, dout)`` per-relation weight matrices
        (general relations only — the self-loop weight is applied densely by
        the caller).

    Returns ``(N, dout)`` aggregated, degree-normalized messages.
    """
    tile = edges.tile_size
    n_tiles = edges.num_tiles
    din = x.shape[-1]

    xg = x[edges.src]  # (E_pad, din) gather
    xg = xg.reshape(n_tiles, tile, din)
    w_t = weights[edges.tile_rel]  # (n_tiles, din, dout)
    msgs = jnp.einsum("tbi,tio->tbo", xg, w_t, precision=precision)
    msgs = msgs.reshape(n_tiles * tile, -1) * edges.val[:, None]
    return aggregate_messages(msgs, edges.dst, edges.num_nodes)


def rel_spmm_diag(
    edges: EdgeSet,
    x: jax.Array,
    diag_weights: jax.Array,
    *,
    aggregate=None,
) -> jax.Array:
    """Diagonal-weight relational SpMM (e-RGCN first layer).

    ``diag_weights``: ``(num_rels, d)`` per-relation weight *vectors*; the
    message is an elementwise product, matching the reference's
    ``einsum('ij,kj->kij')`` diagonal path (``torch_rgcn/layers.py:289-292``).
    ``aggregate(msgs, edges)`` overrides the destination reduction (e.g. the
    Pallas sorted aggregation); default is XLA ``segment_sum``.
    """
    msgs = x[edges.src] * diag_weights[edges.rel]
    msgs = msgs * edges.val[:, None]
    if aggregate is not None:
        return aggregate(msgs, edges)
    return aggregate_messages(msgs, edges.dst, edges.num_nodes)


def rel_spmm_block(
    edges: EdgeSet,
    x: jax.Array,
    blocks: jax.Array,
    *,
    precision: Optional[jax.lax.Precision] = None,
    aggregate=None,
) -> jax.Array:
    """Block-diagonal-weight relational SpMM.

    ``blocks``: ``(num_rels, B, din//B, dout//B)``. The block-diagonal weight
    matrix is never materialized (the reference expands it via
    ``block_diag`` in some paths, ``torch_rgcn/layers.py:244,521``); messages
    are computed blockwise like the reference's fused horizontal block path
    (``torch_rgcn/layers.py:534-543``).
    """
    tile = edges.tile_size
    n_tiles = edges.num_tiles
    num_blocks = blocks.shape[1]
    in_block = blocks.shape[2]
    out_block = blocks.shape[3]

    xg = x[edges.src].reshape(n_tiles, tile, num_blocks, in_block)
    b_t = blocks[edges.tile_rel]  # (n_tiles, B, ib, ob)
    msgs = jnp.einsum("tnbi,tbio->tnbo", xg, b_t, precision=precision)
    msgs = msgs.reshape(n_tiles * tile, num_blocks * out_block)
    msgs = msgs * edges.val[:, None]
    if aggregate is not None:
        return aggregate(msgs, edges)
    return aggregate_messages(msgs, edges.dst, edges.num_nodes)


def rel_spmm_featureless(
    edges: EdgeSet,
    weights: jax.Array,
    *,
    aggregate=None,
) -> jax.Array:
    """Featureless relational SpMM (one-hot identity features).

    With ``X = I`` the message for edge ``(src, rel)`` is row ``src`` of
    ``W[rel]`` — a pure gather. The reference materializes the full stacked
    adjacency and multiplies (``torch_rgcn/layers.py:286-288``); here the
    ``(num_nodes,)``-wide one-hot input never exists.

    ``weights``: ``(num_rels, N, dout)`` (general relations only). A trailing
    pad row per relation is unnecessary because pad edges carry ``val == 0``.
    """
    num_rels, n_rows, dout = weights.shape
    flat = weights.reshape(num_rels * n_rows, dout)
    idx = edges.rel.astype(jnp.int32) * n_rows + edges.src
    msgs = flat[idx] * edges.val[:, None]
    if aggregate is not None:
        return aggregate(msgs, edges)
    return aggregate_messages(msgs, edges.dst, edges.num_nodes)


def rel_spmm_featureless_basis(
    edges: EdgeSet,
    bases: jax.Array,
    comps: jax.Array,
    *,
    precision: Optional[jax.lax.Precision] = None,
    aggregate=None,
    compute_dtype=None,
) -> jax.Array:
    """Featureless SpMM under basis decomposition, without expansion.

    The naive route materializes ``W = comps @ bases`` of shape
    ``(R', N, dout)`` — gigabytes for many-relation RDF graphs (AM: ~533
    relations × ~300k nodes). Since
    ``W[r][n] = Σ_b comps[r, b] · bases[b][n]``, the per-edge message is a
    per-relation *contraction* of the gathered basis rows:

        msgs = einsum('tebo,tb->teo', bases[:, src]​tiles, comps[tile_rel])

    memory: ``O(nb · N · dout)`` for the bases (what the parameters already
    cost) plus one tile of gathered rows — never ``O(R' · N · dout)``.

    When the EdgeSet carries a unique-(src, rel) pair index
    (:func:`rgcn_tpu.graph.structure.build_src_rel_pairs`), the
    contraction runs once per unique pair instead of once per edge —
    see the inline comment; outputs agree to f32 reassociation.

    Args:
      bases: ``(num_bases, N, dout)``; comps: ``(num_general_rels, num_bases)``
      (general relations only — the self row is handled by the caller).
      compute_dtype: optional narrow dtype (``bfloat16`` on real TPUs) for
      the gather table and contraction inputs — halves the dominant
      wide-row gather bytes; contractions accumulate in f32.
    """
    tile = edges.tile_size
    n_tiles = edges.num_tiles
    nb, n_rows, dout = bases.shape
    if compute_dtype is not None:
        bases = bases.astype(compute_dtype)
        comps = comps.astype(compute_dtype)

    # Flat contiguous (N, nb*dout) gather table. Gathering (nb, dout)
    # SLICES of the transposed bases lowers to per-slice strided
    # descriptors — measured 203 ms for 590k rows at AM scale vs 15-19 ms
    # for the same bytes as flat 1600-B rows (benchmarks/probe_nc_parts).
    # The barrier stops XLA re-fusing the transpose into the gather.
    table = jax.lax.optimization_barrier(
        jnp.swapaxes(bases, 0, 1).reshape(n_rows, nb * dout)
    )

    # The gathered-rows intermediate is (E_pad, nb, dout) — gigabytes on
    # many-relation/many-basis graphs (AM: ~2.3M padded edges × 40 bases →
    # measured HBM OOM on a 16 GB chip, with AD doubling it via residuals).
    # Above a budget, contract in tile groups under jax.checkpoint: the
    # messages (E_pad, dout) are the only thing kept; each group's gather
    # is recomputed in the backward.

    if edges.pairs is not None:
        # Unique-(src, rel) pre-contraction: the per-edge message is
        # identical across parallel edges sharing (src, rel) (AM scale:
        # ~2.5 edges/pair), so contract once per unique pair — the wide
        # (nb·dout) basis-row gather AND its backward scatter shrink by
        # that factor; edges then fan out through a cheap (E, dout)
        # gather from the computed pair-message table. `val` multiplies
        # after the fan-out, so runtime reweighting (dropout masks)
        # stays exact.
        pi = edges.pairs
        m = _pair_contract(
            table, comps, pi, nb, dout, precision=precision
        )
        return _pair_fan_aggregate(m, edges, aggregate)

    c_t = comps[edges.tile_rel]  # (n_tiles, nb)
    if n_tiles * tile * nb * dout <= _ELEM_BUDGET:
        rows = table[edges.src].reshape(n_tiles, tile, nb, dout)
        msgs = jnp.einsum("tebo,tb->teo", rows, c_t, precision=precision,
                          preferred_element_type=jnp.float32)
    else:
        group = max(1, _ELEM_BUDGET // (tile * nb * dout))
        while n_tiles % group:
            group -= 1
        src_g = edges.src.reshape(n_tiles // group, group * tile)
        c_g = c_t.reshape(n_tiles // group, group, nb)

        @jax.checkpoint
        def per_group(args):
            src, c = args
            rows = table[src].reshape(group, tile, nb, dout)
            return jnp.einsum("gebo,gb->geo", rows, c, precision=precision,
                              preferred_element_type=jnp.float32)

        msgs = jax.lax.map(per_group, (src_g, c_g))
    msgs = msgs.reshape(n_tiles * tile, dout) * edges.val[:, None]
    if aggregate is not None:
        return aggregate(msgs, edges)
    return aggregate_messages(msgs, edges.dst, edges.num_nodes)


# Lane-pad target for the narrow pair fan-out + aggregation pipeline.
# False (default) -> never pad; int -> pad messages to that width.
# MEASURED NEGATIVE (round 9, quiet tunnel, interleaved mins): widening
# the AM fan-out/aggregation pieces from dout=10 to the 128-lane tile is
# neutral-to-worse (xp_fan 174.6 vs xp_fan128 182.2 ms; xp_agg 288.9 vs
# xp_agg128 291.2; kernel-only 66.7 vs 67.0) — XLA's TPU row gather costs
# ~120-140 ns/row AT THIS PROGRAM SCALE regardless of row width, so
# re-labeling the already-lane-padded bytes buys nothing. Kept as a probe
# knob (probe_stress_nc "_nopad"/pad variants) with exactness tests.
_FAN_AGG_PAD = False
_LANE_TILE = 128


def _fan_pad_width(dout: int):
    if _FAN_AGG_PAD is False or _FAN_AGG_PAD is None or dout >= _LANE_TILE:
        return None
    return max(int(_FAN_AGG_PAD), dout)


def _pair_fan_aggregate(m, edges, aggregate):
    """Fan the (U_pad, dout) pair messages out to edges and aggregate.

    When the EdgeSet carries the composed pair-aggregation layout
    (``edges.pairs.agg``) and the caller requested the Pallas layout
    aggregation, the fan-out composes INTO the aggregation kernel
    (:func:`rgcn_tpu.ops.pallas_aggregate.aggregate_pairs_ad`) — the
    ``(E, dout)`` message tensor never materializes and the backward is
    scatter-free. Otherwise: explicit fan-out + the requested reduction,
    zero-padded to the 128-lane tile when ``_FAN_AGG_PAD`` applies (the
    pad columns are zeros end-to-end, so the slice-back is exact; the
    backward's cotangent gather and pair segment-sum run wide too).
    """
    pi = edges.pairs
    if (
        aggregate is not None
        and pi.agg is not None
        and edges.layout is not None
    ):
        from rgcn_tpu.ops.pallas_aggregate import aggregate_pairs_ad

        return aggregate_pairs_ad(
            m, edges.val, pi.edge_pair, edges.dst, pi.agg, edges.layout,
            edges.num_nodes,
        )
    dout = m.shape[-1]
    pad_w = _fan_pad_width(dout) if aggregate is not None else None
    if pad_w is not None and pad_w > dout:
        m = jnp.pad(m, ((0, 0), (0, pad_w - dout)))
        msgs = m[pi.edge_pair] * edges.val[:, None]
        return aggregate(msgs, edges)[:, :dout]
    msgs = m[pi.edge_pair] * edges.val[:, None]
    if aggregate is not None:
        return aggregate(msgs, edges)
    return aggregate_messages(msgs, edges.dst, edges.num_nodes)


# GEMM-form pair contraction: expand the per-pair basis weights to the
# full nb·dout lanes with a static one-hot (U, nb) @ (nb, nb·dout),
# elementwise-scale the flat gathered rows, and collapse with a static
# (nb·dout, dout) selector — two full-width MXU GEMMs + one elementwise
# pass instead of U batched (1, nb) @ (nb, dout) contractions (measured
# 18.8 vs 28.4 ms interleaved on the AM layer-1 gather+contract piece,
# probe_stress_nc --ab xp_gcgemm,xp_gc post-device_put). Same math
# reassociated; on TPU the per-term product rounds at the compute dtype
# before the f32 collapse accumulation (bf16-class, same as the Pallas
# kernels' default). Default ON: exact-reassociation (tests), measured
# faster end-to-end (pairs_gemm 426.4 vs pairs 432.8; fwd_gemm 88.6 vs
# fwd 92.8, interleaved post-device_put).
_PAIR_CONTRACT_GEMM = True


# Scatter-free wide-gather backward: the AD of ``table[pair_src]`` is an
# XLA scatter-add of (U, nb·dout) cotangent rows into the (N, nb·dout)
# table (measured 21.8 ms/layer at AM scale, probe_stress_nc xp_dt).
# With the host-built pairs-grouped-by-source layout
# (``SrcRelPairs.src_layout``) the same sum runs as ONE presorted Pallas
# aggregation — f32 accumulation (better than the scatter's compute-dtype
# adds), no scatter anywhere in the NC step. Trace-time flag, probe
# variants "_dtlay"; default ON where the layout exists (measured
# interleaved A/B at AM scale: see BASELINE.md round-10 rows).
_PAIR_DT_LAYOUT = True


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _gather_rows_agg_bwd(table, idx, layout, num_rows):
    """``table[idx]`` whose backward aggregates through ``layout``
    (a DstLayout over ``idx`` with ``num_rows`` segments) instead of
    scatter-adding. Semantically identical to plain AD — an exact
    reassociation with f32 accumulation."""
    return table[idx]


def _gather_rows_agg_fwd(table, idx, layout, num_rows):
    return table[idx], (layout,)


def _gather_rows_agg_rev(num_rows, res, g):
    from rgcn_tpu.ops.pallas_aggregate import aggregate_presorted_pallas

    (layout,) = res
    g_z = jnp.concatenate(
        [g, jnp.zeros((1, g.shape[1]), g.dtype)], axis=0
    )
    srt = jax.lax.optimization_barrier(g_z[layout.perm])
    d_table = aggregate_presorted_pallas(srt, layout, num_rows)
    # the cotangent of the gather output carries the table's dtype
    return d_table.astype(g.dtype), None, None


_gather_rows_agg_bwd.defvjp(_gather_rows_agg_fwd, _gather_rows_agg_rev)


def _expand_collapse(nb, dout, dtype):
    expand = (
        jax.lax.broadcasted_iota(jnp.int32, (nb, nb * dout), 1) // dout
        == jax.lax.broadcasted_iota(jnp.int32, (nb, nb * dout), 0)
    ).astype(dtype)
    collapse = (
        jax.lax.broadcasted_iota(jnp.int32, (nb * dout, dout), 0) % dout
        == jax.lax.broadcasted_iota(jnp.int32, (nb * dout, dout), 1)
    ).astype(dtype)
    return expand, collapse


def _pair_contract(table, comps, pi, nb, dout, *, precision=None):
    """Per-unique-(src, rel) contraction ``m[u] = rows[u] · comps[rel_u]``
    from a flat ``(N, nb·dout)`` gather table; checkpoint-grouped above
    the element budget."""
    u_pad = pi.pair_src.shape[0]
    c_u = comps[pi.pair_rel]  # (U_pad, nb)
    if u_pad * nb * dout <= _PAIR_ELEM_BUDGET:
        # barrier AFTER the gather: one contiguous (U, nb·dout) gather
        # pass instead of XLA fusing the gather into the contraction as
        # per-element strided loads (interleaved A/B at AM scale: 82.9 vs
        # 96.5 ms on the gather+contract piece, probe_stress_nc
        # --ab xp_gc,xp_gcmat)
        if (
            _PAIR_DT_LAYOUT
            and pi.src_layout is not None
            and table.ndim == 2
        ):
            rows = jax.lax.optimization_barrier(
                _gather_rows_agg_bwd(
                    table, pi.pair_src, pi.src_layout, table.shape[0]
                )
            )
        else:
            rows = jax.lax.optimization_barrier(table[pi.pair_src])
        if _PAIR_CONTRACT_GEMM:
            expand, collapse = _expand_collapse(nb, dout, rows.dtype)
            c_wide = jnp.dot(c_u.astype(rows.dtype), expand,
                             precision=precision)
            return jnp.dot(rows * c_wide, collapse, precision=precision,
                           preferred_element_type=jnp.float32)
        rows = rows.reshape(u_pad, nb, dout)
        return jnp.einsum("ubo,ub->uo", rows, c_u, precision=precision,
                          preferred_element_type=jnp.float32)
    group = max(1, _PAIR_ELEM_BUDGET // (nb * dout))
    while u_pad % group:
        group -= 1
    src_g = pi.pair_src.reshape(u_pad // group, group)
    c_g = c_u.reshape(u_pad // group, group, nb)

    @jax.checkpoint
    def per_group(args):
        srcs, c = args
        rows = table[srcs].reshape(group, nb, dout)
        return jnp.einsum("gbo,gb->go", rows, c, precision=precision,
                          preferred_element_type=jnp.float32)

    return jax.lax.map(per_group, (src_g, c_g)).reshape(u_pad, dout)


def rel_spmm_basis_pairs(
    edges: EdgeSet,
    x: jax.Array,
    bases: jax.Array,
    comps: jax.Array,
    *,
    precision: Optional[jax.lax.Precision] = None,
    aggregate=None,
    compute_dtype=None,
) -> jax.Array:
    """Featureful basis SpMM through the unique-(src, rel) pair index.

    ``msg_e = val_e · Σ_b comps[rel_e, b] · (x[src_e] @ bases_b)`` depends
    only on ``(src, rel)``, so precompute ``H[n] = stack_b(x[n] @ bases_b)``
    (nb small MXU matmuls) and contract once per unique pair — the same
    dedup + flat-row-gather structure as the featureless path. For
    many-basis layers this replaces per-tile expanded-weight matmuls whose
    narrow (din, dout) shapes waste the MXU (AM layer 2: din=10, dout=11).

    Args:
      x: ``(N, din)``; bases: ``(nb, din, dout)``;
      comps: ``(num_general_rels, nb)`` (general relations only).
    """
    if edges.pairs is None:
        raise ValueError("rel_spmm_basis_pairs requires edges.pairs")
    nb, din, dout = bases.shape
    n = x.shape[0]
    h = jnp.einsum("ni,bio->nbo", x, bases, precision=precision)
    if compute_dtype is not None:
        h = h.astype(compute_dtype)
        comps = comps.astype(compute_dtype)
    table = jax.lax.optimization_barrier(h.reshape(n, nb * dout))
    m = _pair_contract(table, comps, edges.pairs, nb, dout,
                       precision=precision)
    return _pair_fan_aggregate(m, edges, aggregate)
