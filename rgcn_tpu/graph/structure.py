"""Static-shape relational edge structure for TPU message passing.

The reference implementation rebuilds a stacked sparse adjacency matrix inside
every forward pass (``/root/reference/torch_rgcn/layers.py:255-279,489-516``)
and dispatches across four message-passing codepaths. On TPU we instead
preprocess the graph once into a **relation-sorted, tile-padded COO** layout:

* Edges are sorted by ``(relation, receiver)``. Relation-sorting makes the
  per-edge weight matrix blockwise-constant so message computation is dense
  MXU work per tile; receiver-sorting within a relation makes degree counts a
  run-length computation and keeps scatter locality high.
* Each relation's edge segment is padded to a multiple of ``tile_size`` so
  that every tile has a single relation id (``tile_rel``). Shapes are fully
  static; dropped/padding edges simply carry ``val == 0``.
* The normalization coefficient is ``val[e] = 1 / deg_p(s)`` where
  ``deg_p(s)`` counts edges with receiver ``s`` and relation ``p``. This is
  exactly the quantity the reference computes with ``sum_sparse`` plus the
  horizontal reorder trick (``torch_rgcn/utils.py:71-97``,
  ``torch_rgcn/layers.py:266-273,504-510``): under vertical stacking the row
  sum of row ``p*N+s`` is ``deg_p(s)``; under horizontal stacking the
  column sums are computed in transposed order and then reordered
  (inverse-edge block first) so each edge again ends up with
  ``1 / deg_p(subject)``. Both stackings are therefore the *same* operation,
  and this module implements that one operation.

Self-loops (``(v, 2R, v)``) are **not** stored as edges: their normalization
constant is identically 1 (each node has exactly one), so layers add the
self-loop message densely as ``mask * (X @ W_self)`` — an MXU matmul instead
of N scatter-adds. Self-loop dropout (``torch_rgcn/utils.py:110-124``)
becomes a Bernoulli mask on that dense term.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

try:  # JAX is the compute substrate but NumPy-only use (tests, tooling) works.
    import jax

    _HAVE_JAX = True
except Exception:  # pragma: no cover
    _HAVE_JAX = False

from rgcn_tpu.graph.augment import inverse_triples

__all__ = [
    "EdgeSet",
    "PairAggLayout",
    "SrcRelPairs",
    "auto_nc_row_block",
    "build_edge_set",
    "build_pair_agg",
    "build_src_rel_pairs",
    "edge_normalization",
]


@dataclasses.dataclass(frozen=True)
class EdgeSet:
    """Relation-sorted, tile-padded general edges of an augmented graph.

    ``src``/``dst``/``rel``/``val`` all have static length
    ``num_tiles * tile_size``. ``dst`` is the message *receiver* (the triple's
    subject), ``src`` the message *source* (the triple's object) — messages
    flow object → subject over the doubled relation vocabulary, matching the
    reference's stacked-adjacency product (``torch_rgcn/layers.py:286-301``).

    Padding entries have ``val == 0`` and ``dst == num_nodes`` (a dummy row
    sliced off after aggregation); ``src``/``rel`` of pads are in-range so
    gathers stay clamped and harmless.
    """

    src: np.ndarray  # (E_pad,) int32
    dst: np.ndarray  # (E_pad,) int32
    rel: np.ndarray  # (E_pad,) int32
    val: np.ndarray  # (E_pad,) float32
    tile_rel: np.ndarray  # (E_pad // tile_size,) int32
    num_nodes: int
    num_rels: int  # number of *general* relations stored here (2R)
    tile_size: int
    num_edges: int  # real (non-pad) edge count
    # Optional destination-sorted aggregation layout
    # (rgcn_tpu.ops.pallas_aggregate.DstLayout) enabling the fully-Pallas
    # SpMM path; None -> XLA segment_sum aggregation.
    layout: Optional[object] = None
    # Optional transposed edge set (src/dst swapped, SAME normalization
    # values) used by the Pallas SpMM's custom VJP: dX is the same SpMM over
    # reversed edges with per-relation-transposed weights.
    reverse: Optional["EdgeSet"] = None
    # Optional single-pass fused-kernel layout
    # (rgcn_tpu.ops.pallas_fused.FusedLayout); host-built graphs only.
    fused: Optional[object] = None
    # Optional coalesced-pair layout (rgcn_tpu.graph.coalesce
    # .MergedPairLayout): parallel edges merged for the basis/diag
    # kernels — those ops prefer it when present. CAUTION: it is a frozen
    # snapshot of (rel, val); any runtime reweighting of this EdgeSet
    # (e.g. `dataclasses.replace(es, val=es.val * keep_mask)`) MUST also
    # set merged=None, or the coalesced ops will silently compute with
    # the stale weights. (All in-repo producers attach it only to static
    # full-graph EdgeSets whose values never change after construction.)
    merged: Optional[object] = None
    # Optional unique-(src, rel) pair index (:class:`SrcRelPairs`) for the
    # featureless basis path: the per-edge message depends only on
    # (src, rel), so parallel objects contract ONCE per unique pair and
    # fan out through a cheap computed-table gather (RDF graphs average
    # 2-3 edges per pair at AM scale). Unlike `merged`, this freezes only
    # (src, rel) — `val` is applied after the fan-out, so runtime
    # reweighting (dropout masks) stays exact.
    pairs: Optional["SrcRelPairs"] = None

    @property
    def num_tiles(self) -> int:
        return self.tile_rel.shape[0]

    def device_arrays(self):
        """Return the array fields as a dict (convenient for jax.device_put)."""
        return {
            "src": self.src,
            "dst": self.dst,
            "rel": self.rel,
            "val": self.val,
            "tile_rel": self.tile_rel,
        }


@dataclasses.dataclass(frozen=True)
class SrcRelPairs:
    """Unique ``(src, rel)`` pairs of an EdgeSet's real edges.

    The featureless-basis message ``Σ_b comps[rel, b] · bases[b][src]``
    is identical for every parallel edge sharing ``(src, rel)`` (RDF
    subjects list many objects under one predicate, and the augmented
    inverse direction symmetrically). Contracting once per unique pair
    replaces the dominant ``(E, nb·dout)`` basis-row gather (and its
    backward scatter) with a ``(U, nb·dout)`` one plus a cheap
    ``(E, dout)`` gather from the computed pair-message table.

    ``pair_src``/``pair_rel`` may be padded (repeating pair 0) so the
    pair axis divides the checkpoint group size; ``edge_pair`` only ever
    references real pairs, and pad *edges* point at pair 0 with
    ``val == 0``.
    """

    pair_src: np.ndarray  # (U_pad,) int32
    pair_rel: np.ndarray  # (U_pad,) int32
    edge_pair: np.ndarray  # (E_pad,) int32
    num_pairs: int  # real unique-pair count (<= U_pad)
    # Optional composed-aggregation layout (:class:`PairAggLayout`): the
    # edge fan-out gather (``m[edge_pair] * val``) composed INTO the
    # destination layout so the ``(E, dout)`` message tensor never
    # materializes — the aggregation kernel gathers straight from the
    # small ``(U, dout)`` pair-message table, and the backward runs
    # scatter-free through a second host-built layout over slots.
    agg: Optional["PairAggLayout"] = None
    # Optional pairs-grouped-by-source layout
    # (:class:`~rgcn_tpu.ops.pallas_aggregate.DstLayout` over
    # ``pair_src``, ``num_nodes`` segments): makes the wide-gather
    # backward ``dT[n] = Σ_{u: pair_src_u = n} d_rows[u]`` a presorted
    # Pallas aggregation instead of an XLA scatter-add
    # (``ops/spmm.py::_gather_rows_agg_bwd``). Pad pairs carry
    # ``pair_src == 0`` exactly like the scatter path (their cotangents
    # are zero), so semantics are identical.
    src_layout: Optional[object] = None


@dataclasses.dataclass(frozen=True)
class PairAggLayout:
    """Static composition of the pair fan-out with a
    :class:`~rgcn_tpu.ops.pallas_aggregate.DstLayout`.

    Forward: slot ``l`` of the destination layout reads pair
    ``slot_pair[l]`` of the pair-message table (``U_pad`` = the appended
    zero row for pad slots) scaled by the slot's edge value
    (``val_z[layout.perm]`` — composed in-jit so runtime reweighting
    stays exact). Backward: ``d_m[u] = Σ_{l: slot_pair_l = u} v_l ·
    g[slot_dst_l]`` runs as a second presorted aggregation over
    ``grad_layout`` (slots grouped by pair), with the slot→edge and
    slot→dst maps pre-composed on the host (``grad_edge``/``grad_dst``;
    sentinel values ``E_pad``/``num_nodes`` index appended zero rows).

    CAUTION: like ``EdgeSet.merged``, this freezes a snapshot — here the
    composition with the build-time ``layout.perm``. Replacing an
    EdgeSet's ``layout`` (or ``pairs``) MUST also drop ``pairs.agg``, or
    the composed aggregation silently pairs values with the wrong rows.
    (Replacing ``val`` is safe: values enter in-jit through the live
    ``layout.perm``.)
    """

    slot_pair: np.ndarray  # (L,) int32 in [0, U_pad]
    slot_dst: np.ndarray  # (L,) int32 in [0, num_nodes]
    grad_layout: object  # DstLayout over slot_pair (U_pad segments)
    grad_edge: np.ndarray  # (Lb,) int32 in [0, E_pad]
    grad_dst: np.ndarray  # (Lb,) int32 in [0, num_nodes]
    # Optional HOST-composed per-slot values (``val_z[layout.perm]``) and
    # their backward-layout counterpart (``val_z[grad_edge]``): static NC
    # graphs never reweight, so the in-jit (L,)/(Lb,) val gathers are
    # avoidable. Presence makes the CAUTION above stricter: replacing
    # ``val`` (not just layout/pairs) MUST drop ``agg`` too — the
    # value-composed arrays freeze a snapshot of ``val``.
    slot_val: Optional[np.ndarray] = None  # (L,) f32
    grad_val: Optional[np.ndarray] = None  # (Lb,) f32


if _HAVE_JAX:

    def _edgeset_flatten(es: EdgeSet):
        children = (es.src, es.dst, es.rel, es.val, es.tile_rel, es.layout,
                    es.reverse, es.fused, es.merged, es.pairs)
        aux = (es.num_nodes, es.num_rels, es.tile_size, es.num_edges)
        return children, aux

    def _edgeset_unflatten(aux, children):
        (src, dst, rel, val, tile_rel, layout, reverse, fused, merged,
         pairs) = children
        num_nodes, num_rels, tile_size, num_edges = aux
        return EdgeSet(src, dst, rel, val, tile_rel,
                       num_nodes, num_rels, tile_size, num_edges, layout,
                       reverse, fused, merged, pairs)

    jax.tree_util.register_pytree_node(
        EdgeSet, _edgeset_flatten, _edgeset_unflatten
    )

    def _pairs_flatten(p: SrcRelPairs):
        return (
            (p.pair_src, p.pair_rel, p.edge_pair, p.agg, p.src_layout),
            (p.num_pairs,),
        )

    def _pairs_unflatten(aux, children):
        pair_src, pair_rel, edge_pair, agg, src_layout = children
        return SrcRelPairs(
            pair_src, pair_rel, edge_pair, aux[0], agg, src_layout
        )

    jax.tree_util.register_pytree_node(
        SrcRelPairs, _pairs_flatten, _pairs_unflatten
    )

    def _pair_agg_flatten(p: PairAggLayout):
        return (
            (p.slot_pair, p.slot_dst, p.grad_layout, p.grad_edge,
             p.grad_dst, p.slot_val, p.grad_val),
            (),
        )

    def _pair_agg_unflatten(aux, children):
        del aux
        return PairAggLayout(*children)

    jax.tree_util.register_pytree_node(
        PairAggLayout, _pair_agg_flatten, _pair_agg_unflatten
    )


def edge_normalization(
    rel: np.ndarray,
    dst: np.ndarray,
    num_nodes: int,
    mask: Optional[np.ndarray] = None,
) -> np.ndarray:
    """``1 / deg`` normalization per ``(rel, dst)`` group (NumPy version).

    ``deg`` counts (kept) edges sharing the receiver and relation, i.e. the
    row-sum of the vertically stacked adjacency
    (``torch_rgcn/utils.py:71-97``). Masked-out edges get value 0 and do not
    count toward their group's degree — this is how edge dropout preserves
    the reference's "normalize over surviving edges" behavior
    (``experiments/predict_links.py:143-148`` subsamples *before* the layer
    normalizes) without dynamic shapes.
    """
    key = rel.astype(np.int64) * (num_nodes + 1) + dst.astype(np.int64)
    if mask is None:
        mask = np.ones(rel.shape[0], dtype=np.float32)
    uniq, inv = np.unique(key, return_inverse=True)
    deg = np.zeros(uniq.shape[0], dtype=np.float32)
    np.add.at(deg, inv, mask.astype(np.float32))
    deg_e = deg[inv]
    return np.where(deg_e > 0, mask / np.maximum(deg_e, 1.0), 0.0).astype(
        np.float32
    )


def build_src_rel_pairs(
    es: EdgeSet, pad_multiple: int = 1024, order: str = "rel"
) -> SrcRelPairs:
    """Unique-(src, rel) index over an EdgeSet's real edges.

    Pad edges (``dst == num_nodes``) map to pair 0; their ``val == 0``
    zeroes the fanned-out message. The pair axis is padded to a multiple
    of ``pad_multiple`` (repeating pair 0) so checkpoint tile groups
    divide it evenly.

    ``order`` picks the pair ordering. ``"rel"`` sorts by ``(rel, src)``
    (pair-contraction inputs grouped by relation). ``"src"`` sorts by
    ``(src, rel)`` so the WIDE basis-table gather (``table[pair_src]``,
    the 480 MB table at AM scale) reads globally ascending rows — and
    its backward scatters ascending — while only the small computed
    pair-message table (tens of MB) eats the fan-out's locality loss.
    """
    real = es.dst < es.num_nodes
    # int64 keys: numpy 2.0's int32 fancy indexing hits a ~300x slow path
    if order == "src":
        # es.num_rels already counts the general (doubled) relations
        key = es.src.astype(np.int64) * (es.num_rels + 1) + es.rel
    elif order == "rel":
        key = es.rel.astype(np.int64) * (es.num_nodes + 1) + es.src
    else:
        raise ValueError(f"unknown pair order {order!r}")
    uniq, inv = np.unique(key[real], return_inverse=True)
    num_pairs = int(uniq.shape[0])
    u_pad = max(pad_multiple, -(-num_pairs // pad_multiple) * pad_multiple)

    pair_src = np.zeros(u_pad, dtype=np.int64)
    pair_rel = np.zeros(u_pad, dtype=np.int64)
    if order == "src":
        pair_src[:num_pairs] = uniq // (es.num_rels + 1)
        pair_rel[:num_pairs] = uniq % (es.num_rels + 1)
    else:
        pair_src[:num_pairs] = uniq % (es.num_nodes + 1)
        pair_rel[:num_pairs] = uniq // (es.num_nodes + 1)
    # pad pairs repeat pair 0 (never referenced by a real edge's slot
    # unless pair 0 itself is, which is fine)

    edge_pair = np.zeros(es.src.shape[0], dtype=np.int64)
    edge_pair[real] = inv
    return SrcRelPairs(
        pair_src=pair_src.astype(np.int32),
        pair_rel=pair_rel.astype(np.int32),
        edge_pair=edge_pair.astype(np.int32),
        num_pairs=num_pairs,
    )


def build_pair_agg(
    es: EdgeSet, grad_pad_to: Optional[int] = None
) -> PairAggLayout:
    """Compose an EdgeSet's pair fan-out with its destination layout.

    Requires ``es.pairs`` and ``es.layout``. All maps are static: the
    layout permutation points pad slots at ``E_pad`` (the appended
    zero-message row), which composes to pair ``U_pad`` / dst
    ``num_nodes`` sentinels (both index appended zero rows at use).

    ``grad_pad_to`` pads the backward (slots-grouped-by-pair) layout to a
    fixed slot count — per-shard layouts of an edge-partitioned graph
    need uniform static shapes across shards
    (:func:`rgcn_tpu.dist.mesh.prepare_sharded_pairs_host`).
    """
    if es.pairs is None or es.layout is None:
        raise ValueError("build_pair_agg needs pairs and a dst layout")
    from rgcn_tpu.ops.pallas_aggregate import build_dst_layout

    pi = es.pairs
    perm = np.asarray(es.layout.perm)
    e_pad = es.src.shape[0]
    u_pad = pi.pair_src.shape[0]

    edge_pair_z = np.concatenate(
        [np.asarray(pi.edge_pair), [u_pad]]
    ).astype(np.int64)
    dst_z = np.concatenate([np.asarray(es.dst), [es.num_nodes]]).astype(
        np.int64
    )
    slot_pair = edge_pair_z[perm].astype(np.int32)
    slot_dst = dst_z[perm].astype(np.int32)

    # Backward layout: slots grouped by pair (pad slots carry the U_pad
    # sentinel and are dropped like pad edges). Same block-count policy
    # as the forward NC layouts.
    grad_layout = build_dst_layout(
        slot_pair, u_pad,
        row_block=auto_nc_row_block(u_pad, chunk=es.layout.chunk),
        chunk=es.layout.chunk, pad_to=grad_pad_to,
    )
    gperm = np.asarray(grad_layout.perm)
    perm_z = np.concatenate([perm, [e_pad]]).astype(np.int64)
    grad_edge = perm_z[gperm].astype(np.int32)
    grad_dst = dst_z[grad_edge].astype(np.int32)  # e_pad -> num_nodes
    # Host-composed values: static NC graphs never reweight, so the
    # per-step (L,)/(Lb,) val gathers are avoidable (sentinels -> 0).
    val_z = np.concatenate(
        [np.asarray(es.val, dtype=np.float32), [0.0]]
    ).astype(np.float32)
    return PairAggLayout(
        slot_pair=slot_pair,
        slot_dst=slot_dst,
        grad_layout=grad_layout,
        grad_edge=grad_edge,
        grad_dst=grad_dst,
        slot_val=val_z[np.minimum(perm, e_pad)],
        grad_val=val_z[grad_edge],
    )


def reweight_edge_set(es: EdgeSet, val) -> EdgeSet:
    """Replace per-edge values SAFELY.

    Value snapshots must not go stale. Drops every structure that froze
    ``val`` at build time: the coalesced ``merged`` layout (per-slot
    coefficients freeze ``(rel, val)``), the pair-agg value-composed
    arrays (``slot_val``/``grad_val``), the ``fused`` relation-quantum
    layout (stores a value-sorted copy), and the ``reverse`` EdgeSet
    (carries ``val[r_order]`` plus its own fused layout). KEEPS the dst
    layout, pair index, composed aggregation maps and ``src_layout`` —
    those freeze only topology, and the composed path falls back to
    gathering the live values in-jit (``val_z[layout.perm]``), which
    stays exact under masks
    (``tests/test_spmm.py::test_composed_pair_aggregation_exact``).

    Note dropping ``reverse``/``fused`` disables the Pallas custom-VJP
    kernel paths that need them (they would otherwise compute with
    pre-mask values); the XLA and pair paths remain. Rebuild via
    :func:`build_edge_set` for a reweighted graph that needs those
    kernels — or build masked values INTO the graph like the dynamic
    per-epoch builders do (:mod:`rgcn_tpu.graph.dynamic`).
    """
    pairs = es.pairs
    if pairs is not None and pairs.agg is not None:
        pairs = dataclasses.replace(
            pairs,
            agg=dataclasses.replace(
                pairs.agg, slot_val=None, grad_val=None
            ),
        )
    return dataclasses.replace(
        es, val=val, merged=None, pairs=pairs, fused=None, reverse=None
    )


def build_pair_src_layout(es: EdgeSet, pad_to: Optional[int] = None):
    """Pairs-grouped-by-source layout: a
    :class:`~rgcn_tpu.ops.pallas_aggregate.DstLayout` over ``pair_src``
    with ``num_nodes`` segments, for the scatter-free wide-gather
    backward (``ops/spmm.py::_gather_rows_agg_bwd``). Pad pairs carry
    ``pair_src == 0`` — included, exactly like the XLA scatter they
    replace (their cotangents are zero).

    ``pad_to`` pads to a fixed slot count for shard-uniform shapes
    (:func:`rgcn_tpu.dist.mesh.prepare_sharded_pairs_host`).
    """
    if es.pairs is None or es.layout is None:
        raise ValueError("build_pair_src_layout needs pairs and a layout")
    from rgcn_tpu.ops.pallas_aggregate import build_dst_layout

    chunk = es.layout.chunk
    return build_dst_layout(
        np.asarray(es.pairs.pair_src), es.num_nodes,
        row_block=auto_nc_row_block(es.num_nodes, chunk=chunk),
        chunk=chunk, pad_to=pad_to,
    )


def auto_nc_row_block(num_nodes: int, chunk: int = 256) -> int:
    """Aggregation-layout row block for STATIC full-graph (NC) EdgeSets.

    Measured on AM-scale narrow-output aggregation (dout=10, 1.6M slots,
    ``benchmarks/probe_nc_parts.py``): the rb=128 default costs 280-355 ms
    vs 76-83 ms at rb>=512 — per-row-block overhead dominates when
    ``N / rb`` is thousands of blocks. Escalate until the block count is
    ~<=640 (capped at 2048); small graphs keep rb=128 (the swept optimum
    at WN18 scale).
    """
    rb = 128
    while rb < 2048 and -(-num_nodes // rb) > 640:
        rb *= 2
    return rb


def build_edge_set(
    triples: np.ndarray,
    num_nodes: int,
    num_rels: int,
    tile_size: int = 128,
    add_inverses: bool = True,
    tile_multiple: int = 1,
    with_dst_layout: bool = False,
    prefer_native: bool = True,
    with_merged_layout: bool = False,
    with_pair_index: bool = False,
    with_pair_agg: bool = False,
    layout_row_block: Optional[int] = None,
    layout_chunk: Optional[int] = None,
) -> EdgeSet:
    """Preprocess raw ``(s, p, o)`` triples into a static :class:`EdgeSet`.

    ``with_pair_agg=True`` (requires ``with_pair_index`` and
    ``with_dst_layout``) additionally composes the pair fan-out into the
    aggregation layout (:func:`build_pair_agg`) — the NC trainer's
    default for many-basis configs since round 10: it HALVES the
    AM-scale step (212.9 vs 426.8 ms interleaved, canary-quiet;
    ``benchmarks/probe_stress_nc.py --ab agg,pairs --draws 4``) via the
    small (U, dout) gather table and the scatter-free d_m backward. Its
    earlier "2.3× slower forward" verdict (round 7) was per-step numpy
    transfer contamination — the composed path carries ~20 MB more index
    arrays, which pre-``device_put`` probes re-transferred every call.

    ``triples`` holds the *original* graph (relations in ``[0, R)``); inverse
    edges are generated here (relation ``p + R``), mirroring
    ``add_inverse_and_self`` (``torch_rgcn/utils.py:127-141``) except that
    self-loops are intentionally excluded (handled densely by the layers).

    ``with_dst_layout=True`` additionally attaches the destination-sorted
    aggregation layout enabling the fully-Pallas SpMM path.

    ``with_merged_layout=True`` additionally attaches the coalesced-pair
    layout (:mod:`rgcn_tpu.graph.coalesce`) that the *basis* SpMM prefers —
    parallel edges across relations merge into single gather slots (real
    KGs are reciprocal, so this ~halves the edge stage on e.g. WN18).
    Requires a modest relation vocabulary (R' <= 128); other decomposition
    paths ignore it.

    When the native (C++/OpenMP) builder is compiled (``make -C native``) it
    handles the sort/normalize/tile pipeline — bit-identical output, ~30x
    faster on large graphs. Set ``prefer_native=False`` to force NumPy.
    """
    triples = np.asarray(triples, dtype=np.int64)
    if triples.ndim != 2 or triples.shape[1] != 3:
        raise ValueError(f"triples must be (E, 3), got {triples.shape}")

    def _attach_merged(es: EdgeSet) -> EdgeSet:
        if with_pair_index:
            es = dataclasses.replace(es, pairs=build_src_rel_pairs(es))
            if with_pair_agg:
                if es.layout is None:
                    raise ValueError(
                        "with_pair_agg requires with_dst_layout"
                    )
                es = dataclasses.replace(
                    es,
                    pairs=dataclasses.replace(
                        es.pairs, agg=build_pair_agg(es)
                    ),
                )
                es = dataclasses.replace(
                    es,
                    pairs=dataclasses.replace(
                        es.pairs, src_layout=build_pair_src_layout(es)
                    ),
                )
        if not with_merged_layout:
            return es
        from rgcn_tpu.graph.coalesce import MERGED_MAX_RELS, build_merged_layout

        if es.num_rels > MERGED_MAX_RELS:
            # skip, don't raise: the flag means "merge if worthwhile" —
            # callers (and the basis/diag ops) fall back to the unmerged
            # path when `merged` is absent
            return es
        return dataclasses.replace(
            es,
            merged=build_merged_layout(
                es.dst, es.src, es.rel, es.val, es.num_nodes, es.num_rels
            ),
        )

    if prefer_native and add_inverses:
        from rgcn_tpu.graph import native as _native

        if _native.native_available():
            es = _native.build_edge_set_native(
                triples, num_nodes, num_rels, tile_size=tile_size,
                tile_multiple=tile_multiple, with_dst_layout=with_dst_layout,
                layout_row_block=layout_row_block, layout_chunk=layout_chunk,
            )
            if es is not None:
                return _attach_merged(es)

    if add_inverses:
        triples = np.concatenate(
            [triples, inverse_triples(triples, num_rels)], axis=0
        )
        num_general = 2 * num_rels
    else:
        num_general = num_rels

    dst = triples[:, 0]  # receiver = subject
    rel = triples[:, 1]
    src = triples[:, 2]  # source = object

    # Sort by (relation, receiver): relation-uniform tiles + run-length degrees.
    order = np.lexsort((dst, rel))
    src, dst, rel = src[order], dst[order], rel[order]

    val = edge_normalization(rel, dst, num_nodes)

    es = _assemble_edge_set(
        src, dst, rel, val, num_nodes, num_general, tile_size, tile_multiple,
        with_dst_layout, layout_row_block=layout_row_block,
        layout_chunk=layout_chunk,
    )
    if with_dst_layout:
        from rgcn_tpu.ops.pallas_fused import build_fused_layout

        # Transposed copy for the Pallas SpMM's custom VJP: swap src/dst,
        # KEEP the forward normalization values (they are constants of the
        # op, not recomputed degrees of the reversed orientation).
        r_order = np.lexsort((src, rel))
        rev = _assemble_edge_set(
            dst[r_order], src[r_order], rel[r_order], val[r_order],
            num_nodes, num_general, tile_size, tile_multiple, True,
            layout_row_block=layout_row_block, layout_chunk=layout_chunk,
        )
        rev = dataclasses.replace(rev, fused=build_fused_layout(rev))
        es = dataclasses.replace(
            es, reverse=rev, fused=build_fused_layout(es)
        )
    return _attach_merged(es)


def _assemble_edge_set(
    src: np.ndarray,
    dst: np.ndarray,
    rel: np.ndarray,
    val: np.ndarray,
    num_nodes: int,
    num_general: int,
    tile_size: int,
    tile_multiple: int = 1,
    with_dst_layout: bool = False,
    layout_row_block: Optional[int] = None,
    layout_chunk: Optional[int] = None,
) -> EdgeSet:
    """Tile-pad pre-sorted (by relation) edge arrays into an EdgeSet."""
    # Pad each relation segment to a multiple of tile_size.
    counts = np.bincount(rel, minlength=num_general)
    padded = np.maximum(np.ceil(counts / tile_size).astype(np.int64), 0) * tile_size
    offsets = np.concatenate([[0], np.cumsum(padded)])[:-1]
    starts = np.concatenate([[0], np.cumsum(counts)])[:-1]

    e_pad = int(padded.sum())
    if e_pad == 0:
        e_pad = tile_size  # degenerate empty graph still gets one masked tile
    if tile_multiple > 1:
        # round the tile count up so the tile axis divides a device mesh
        chunk = tile_size * tile_multiple
        e_pad = ((e_pad + chunk - 1) // chunk) * chunk
    pos = offsets[rel] + (np.arange(rel.shape[0]) - starts[rel])

    def scatter(values, fill, dtype):
        out = np.full(e_pad, fill, dtype=dtype)
        out[pos] = values
        return out

    src_p = scatter(src, 0, np.int32)
    dst_p = scatter(dst, num_nodes, np.int32)  # pads target the dummy row
    val_p = scatter(val, 0.0, np.float32)

    # Every tile has one relation; derive it from the padded offsets.
    n_tiles = e_pad // tile_size
    tile_starts = np.arange(n_tiles, dtype=np.int64) * tile_size
    cum_padded = np.cumsum(padded)
    tile_rel = np.searchsorted(cum_padded, tile_starts, side="right")
    tile_rel = np.minimum(tile_rel, max(num_general - 1, 0)).astype(np.int32)
    rel_p = np.repeat(tile_rel, tile_size).astype(np.int32)

    layout = None
    if with_dst_layout:
        from rgcn_tpu.ops.pallas_aggregate import build_dst_layout

        kw = {}
        if layout_row_block is not None:
            kw["row_block"] = layout_row_block
        if layout_chunk is not None:
            kw["chunk"] = layout_chunk
        layout = build_dst_layout(dst_p, num_nodes, **kw)

    return EdgeSet(
        src=src_p,
        dst=dst_p,
        rel=rel_p,
        val=val_p,
        tile_rel=tile_rel,
        num_nodes=int(num_nodes),
        num_rels=int(num_general),
        tile_size=int(tile_size),
        num_edges=int(src.shape[0]),
        layout=layout,
    )
