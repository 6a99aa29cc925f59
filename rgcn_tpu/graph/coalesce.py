"""Edge coalescing: merge parallel edges for basis-decomposed SpMM.

In basis decomposition the per-edge aggregation weight is a *scalar* per
basis, ``w_be = val_e * comps[rel_e, b]`` (see
:mod:`rgcn_tpu.ops.pallas_basis`), and aggregation is linear — so edges
that connect the SAME ``(receiver, source)`` node pair under different
relations can be merged into one layout slot whose weight is the sum of
the member edges' weights:

    Agg_b[d] = sum_e val_e * comps[rel_e, b] * x[src_e]
             = sum_{pairs (d, s)} ( sum_{e on pair} val_e * comps[rel_e, b] ) * x[s]

This matters because real knowledge graphs are heavily *reciprocal*: WN18
famously stores both directions of its hierarchy relations (hyponym /
hypernym, meronym / holonym, ...) and has symmetric relations
(``_similar_to``, ``_verb_group``, ...) — ~94% of WN18 test triples have
their inverse in train (Toutanova & Chen 2015; Dettmers et al. 2018,
"Convolutional 2D Knowledge Graph Embeddings"). After the framework's own
inverse augmentation (``graph/augment.py``, mirroring the reference's
``add_inverse_and_self`` at ``/root/reference/utils/utils.py:127-141``),
each reciprocal triple pair produces the same ``(dst, src)`` pair TWICE
(once forward, once as the partner's inverse), so pair merging shrinks the
edge stage — whose cost is the per-slot source-row gather, the measured
single-chip wall (STATUS.md) — by ~1.8x on WN18-shaped graphs. On graphs
without parallel edges merging is an exact no-op (slot count unchanged).

The merged weights must stay differentiable w.r.t. ``comps``. Rather than
an in-jit segment-sum over member edges (a scatter — the op class the
Pallas layouts exist to avoid), the merge is represented as a STATIC
per-slot relation-coefficient matrix

    coeff[l, r] = sum_{e on pair(l), rel_e = r} val_e        # (L, R') host-built

so that in-jit ``wvec = (coeff @ comps).T`` is one small MXU matmul and the
backward contraction ``dcomps = coeff^T @ t`` replaces the unmerged path's
``segment_sum`` by relation. The dense ``(L, R')`` matrix is viable for
modest relation vocabularies only; :func:`build_merged_layout` refuses when
``R'`` exceeds ``max_rels`` (WN18: R' = 36).

Exactness: merging only reassociates a sum of identical-shape terms; all
merged-vs-unmerged tests assert allclose at f32 (``tests/test_coalesce.py``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from rgcn_tpu.ops.pallas_aggregate import DstLayout, build_dst_layout

try:
    import jax

    _HAVE_JAX = True
except Exception:  # pragma: no cover
    _HAVE_JAX = False

__all__ = [
    "DedupFwdLayout",
    "MergedPairLayout",
    "build_merged_layout",
    "merge_applicable",
    "MERGED_MAX_RELS",
]

#: Largest general-relation vocabulary for which the dense (L, R')
#: coefficient matrix is worth its memory/traffic.
MERGED_MAX_RELS = 128


def merge_applicable(
    num_general_rels: int,
    *,
    decomposition: Optional[str] = None,
    num_bases: int = 0,
    diag: bool = False,
) -> bool:
    """Will some layer path actually consume a merged layout?

    The ONE place encoding which configurations ride the coalesced paths
    (trainers must not re-derive this): the diag kernel always can; the
    basis kernel only for ``num_bases <= 8`` (wider basis configs expand
    to dense weights inside the layer — ``nn/layers.py`` — and ignore
    ``edges.merged``); everything else ignores it. Large relation
    vocabularies are refused wholesale (see :data:`MERGED_MAX_RELS`).
    """
    if num_general_rels > MERGED_MAX_RELS:
        return False
    if diag:
        return True
    return decomposition == "basis" and 0 < num_bases <= 8


@dataclasses.dataclass(frozen=True)
class DedupFwdLayout:
    """Source-dedup'd forward frame: within each destination row block,
    pairs sharing a SOURCE are packed into one gather slot holding up to
    ``K`` (local destination, coefficient-row) contributions — the source
    row is fetched once and fanned out to its receivers through ``K``
    one-hot masks in-kernel (:func:`rgcn_tpu.ops.pallas_basis
    .weighted_aggregate_dedup_pallas`). Exactly the same terms as the
    plain merged frame, reassociated; the gather shrinks by the measured
    within-block duplicate factor (~1.25x raw on WN18-shaped graphs,
    ~1.1-1.17x after chunk padding).

    ``local_k`` uses the row-block one-hot convention (pad contributions
    carry ``row_block`` and vanish); ``coeff_k[k]`` is a per-slot relation
    coefficient matrix per contribution lane (zero rows on pads).
    """

    src_sorted: np.ndarray  # (Ld,) int32 — per-slot source (pads -> 0)
    local_k: np.ndarray  # (K, n_chunks, CH) int32 in [0, RB]
    chunk_block: np.ndarray  # (n_chunks,) int32
    coeff_k: np.ndarray  # (K, Ld, R') float32
    num_row_blocks: int
    row_block: int
    chunk: int

    @property
    def num_chunks(self) -> int:
        return self.chunk_block.shape[0]

    @property
    def num_k(self) -> int:
        return self.local_k.shape[0]


if _HAVE_JAX:

    def _ddl_flatten(d: DedupFwdLayout):
        return (
            (d.src_sorted, d.local_k, d.chunk_block, d.coeff_k),
            (d.num_row_blocks, d.row_block, d.chunk),
        )

    def _ddl_unflatten(aux, children):
        src_sorted, local_k, chunk_block, coeff_k = children
        nrb, rb, ch = aux
        return DedupFwdLayout(
            src_sorted, local_k, chunk_block, coeff_k, nrb, rb, ch
        )

    jax.tree_util.register_pytree_node(
        DedupFwdLayout, _ddl_flatten, _ddl_unflatten
    )


@dataclasses.dataclass(frozen=True)
class MergedPairLayout:
    """Coalesced ``(receiver, source)`` pair layout for the basis kernel.

    Forward frame (receiver = destination):

    * ``layout`` — :class:`DstLayout` over the unique pairs.
    * ``src_sorted (L,)`` — per-slot source node (pads -> 0, coeff row 0).
    * ``coeff (L, R')`` — per-slot relation coefficients (see module doc).

    Reverse frame (receiver = source; used by the VJP):

    * ``rev_layout`` / ``rev_src_sorted`` — same pairs with the roles
      swapped: the reverse slot's *source* is the forward pair's receiver
      (the rows gathered there are the output cotangent rows).
    * ``rev_receiver (L',)`` — the reverse slot's receiver == the forward
      pair's source; the ``dcomps`` contraction gathers ``x`` there so the
      cotangent-row gather is shared with the ``dx`` aggregation.
    * ``rev_coeff (L', R')`` — the same pair coefficients in reverse-slot
      order.
    """

    layout: DstLayout
    src_sorted: np.ndarray  # (L,) int32
    coeff: np.ndarray  # (L, R') float32
    rev_layout: DstLayout
    rev_src_sorted: np.ndarray  # (L',) int32
    rev_receiver: np.ndarray  # (L',) int32
    rev_coeff: np.ndarray  # (L', R') float32
    num_nodes: int
    num_rels: int  # R' (general relations, inverses included)
    num_pairs: int  # unique real (dst, src) pairs
    num_edges: int  # real member edges merged into the pairs
    #: optional source-dedup'd forward frame (build_merged_layout(dedup_k=K));
    #: the backward frames above are shared — the VJP only consumes `agg`
    #: and the rev_* fields, which dedup does not change.
    fwd_dedup: Optional[DedupFwdLayout] = None


if _HAVE_JAX:

    def _mpl_flatten(m: MergedPairLayout):
        children = (
            m.layout, m.src_sorted, m.coeff,
            m.rev_layout, m.rev_src_sorted, m.rev_receiver, m.rev_coeff,
            m.fwd_dedup,
        )
        aux = (m.num_nodes, m.num_rels, m.num_pairs, m.num_edges)
        return children, aux

    def _mpl_unflatten(aux, children):
        (layout, src_sorted, coeff,
         rev_layout, rev_src_sorted, rev_receiver, rev_coeff,
         fwd_dedup) = children
        num_nodes, num_rels, num_pairs, num_edges = aux
        return MergedPairLayout(
            layout, src_sorted, coeff,
            rev_layout, rev_src_sorted, rev_receiver, rev_coeff,
            num_nodes, num_rels, num_pairs, num_edges, fwd_dedup,
        )

    jax.tree_util.register_pytree_node(
        MergedPairLayout, _mpl_flatten, _mpl_unflatten
    )


def _pair_frame(
    recv: np.ndarray,
    source: np.ndarray,
    pair_coeff: np.ndarray,
    num_nodes: int,
    row_block: int,
    chunk: int,
    pad_to: Optional[int],
):
    """Build one frame's (DstLayout over pairs, per-slot source, per-slot
    coeff) given per-pair receiver/source/coefficients."""
    layout = build_dst_layout(
        recv, num_nodes, row_block=row_block, chunk=chunk, pad_to=pad_to
    )
    n_pairs = recv.shape[0]
    src_z = np.concatenate([source, np.zeros((1,), np.int32)])
    coeff_z = np.concatenate(
        [pair_coeff, np.zeros((1, pair_coeff.shape[1]), np.float32)], axis=0
    )
    perm = layout.perm  # pads -> n_pairs (one-past-end -> zero row)
    # np.take, not fancy indexing: numpy 2.0's int32-index row gather hits
    # a slow path (~300x) that made this the whole build's cost
    return (
        layout,
        np.take(src_z, perm).astype(np.int32),
        np.take(coeff_z, perm, axis=0),
    )


def _build_dedup_frame(
    pair_d: np.ndarray,
    pair_s: np.ndarray,
    coeff: np.ndarray,
    num_nodes: int,
    row_block: int,
    chunk: int,
    k: int,
) -> DedupFwdLayout:
    """Pack within-(row block) same-source pairs into K-lane gather slots.

    Every pair becomes exactly one (slot, lane) contribution; a group of
    ``m`` pairs sharing ``(row block, src)`` occupies ``ceil(m / k)``
    slots. Per-block slot counts pad to a chunk multiple with at least one
    chunk (unvisited output blocks would stay uninitialized — same
    convention as :func:`rgcn_tpu.ops.pallas_aggregate.build_dst_layout`).
    """
    n = pair_d.shape[0]
    num_row_blocks = -(-num_nodes // row_block)
    blk = (pair_d // row_block).astype(np.int64)
    order = np.lexsort((pair_s, blk))
    b_o = blk[order]
    s_o = pair_s[order]
    local_o = (pair_d[order] - b_o.astype(pair_d.dtype) * row_block).astype(
        np.int32
    )
    coeff_o = np.take(coeff, order, axis=0)

    new = np.ones(n, dtype=bool)
    new[1:] = (b_o[1:] != b_o[:-1]) | (s_o[1:] != s_o[:-1])
    gid = np.cumsum(new) - 1
    first = np.flatnonzero(new)  # (G,) first pair index of each group
    rank = np.arange(n) - first[gid]
    slot_in_group = rank // k
    lane = rank % k

    counts = np.diff(np.append(first, n))
    slots_per_group = -(-counts // k)  # (G,)
    g_blk = b_o[first]  # (G,) block of each group

    slots_per_block = np.zeros(num_row_blocks, np.int64)
    np.add.at(slots_per_block, g_blk, slots_per_group)
    padded_per_block = np.maximum(-(-slots_per_block // chunk), 1) * chunk
    block_off = np.concatenate([[0], np.cumsum(padded_per_block)[:-1]])

    # group's slot offset within its block: exclusive cumsum of
    # slots_per_group, rebased at each block boundary (groups are
    # block-sorted)
    gs_excl = np.cumsum(slots_per_group) - slots_per_group
    gnew = np.ones(len(first), dtype=bool)
    gnew[1:] = g_blk[1:] != g_blk[:-1]
    block_start_excl = gs_excl[np.flatnonzero(gnew)]
    group_off = gs_excl - block_start_excl[np.cumsum(gnew) - 1]
    group_base = block_off[g_blk] + group_off  # (G,) absolute slot base

    slot_idx = (group_base[gid] + slot_in_group).astype(np.int64)  # per pair
    total = int(padded_per_block.sum())

    src_sorted = np.zeros(total, np.int32)
    src_sorted[slot_idx] = s_o  # lanes of one slot share the source
    local_k = np.full((k, total), row_block, np.int32)
    local_k[lane, slot_idx] = local_o
    coeff_k = np.zeros((k, total, coeff.shape[1]), np.float32)
    coeff_k[lane, slot_idx] = coeff_o

    n_chunks = total // chunk
    chunk_block = np.repeat(
        np.arange(num_row_blocks), padded_per_block // chunk
    ).astype(np.int32)

    return DedupFwdLayout(
        src_sorted=src_sorted,
        local_k=local_k.reshape(k, n_chunks, chunk),
        chunk_block=chunk_block,
        coeff_k=coeff_k,
        num_row_blocks=int(num_row_blocks),
        row_block=int(row_block),
        chunk=int(chunk),
    )


def build_merged_layout(
    dst: np.ndarray,
    src: np.ndarray,
    rel: np.ndarray,
    val: np.ndarray,
    num_nodes: int,
    num_rels: int,
    *,
    row_block: int = 128,
    # chunk swept on-chip at WN18 scale over 3 independent processes:
    # ch=256 and ch=128 are within measurement noise (0.80-0.87 ms; one
    # 0.54 ms ch=128 reading did not reproduce), ch=64 and rb=64/256 are
    # consistently worse — see benchmarks/kernels.py. Round-4 re-sweep at
    # the real-size workload: ch=512 is also worse (0.95 vs 0.79 ms
    # same-process, both rb=128 and rb=256 — chunk padding grows faster
    # than DMA efficiency), rb=64 1.12 ms.
    chunk: int = 256,
    max_rels: int = 128,
    pad_to: Optional[int] = None,
    rev_pad_to: Optional[int] = None,
    dedup_k: int = 0,
) -> MergedPairLayout:
    """Coalesce augmented edges into a :class:`MergedPairLayout`.

    Inputs are per-edge arrays of the *augmented* general-relation graph
    (inverses included, self-loops excluded — exactly an
    :class:`~rgcn_tpu.graph.structure.EdgeSet`'s fields, padded or not:
    entries with ``dst >= num_nodes`` or ``val == 0`` are ignored).

    ``num_rels`` is the general-relation vocabulary size R'. Refuses when
    ``R' > max_rels`` (the dense coefficient matrix would not be worth its
    HBM traffic); callers fall back to the unmerged path.

    ``pad_to`` / ``rev_pad_to`` pad the two frames' slot counts so
    host-built per-epoch layouts stay shape-stable across recompiles (same
    contract as :func:`~rgcn_tpu.ops.pallas_aggregate.build_dst_layout`).

    ``dedup_k > 1`` additionally builds the source-dedup'd forward frame
    (:class:`DedupFwdLayout`, consumed automatically by
    :func:`rgcn_tpu.ops.pallas_basis.rel_spmm_basis_merged_ad`'s forward);
    the plain forward and both reverse frames are kept — the VJP uses them
    unchanged.
    """
    if num_rels > max_rels:
        raise ValueError(
            f"merged layout needs num_rels <= {max_rels} (got {num_rels}); "
            "use the unmerged basis path"
        )
    dst = np.asarray(dst)
    src = np.asarray(src)
    rel = np.asarray(rel)
    val = np.asarray(val, dtype=np.float32)

    real = (dst < num_nodes) & (val != 0.0)
    d, s, r, v = dst[real], src[real], rel[real], val[real]

    key = d.astype(np.int64) * num_nodes + s.astype(np.int64)
    uniq, inv = np.unique(key, return_inverse=True)
    n_pairs = uniq.shape[0]
    pair_d = (uniq // num_nodes).astype(np.int32)
    pair_s = (uniq % num_nodes).astype(np.int32)

    coeff = np.zeros((n_pairs, num_rels), dtype=np.float32)
    np.add.at(coeff, (inv, r), v)

    layout, src_sorted, coeff_sorted = _pair_frame(
        pair_d, pair_s, coeff, num_nodes, row_block, chunk, pad_to
    )

    # Reverse frame: receiver = forward source. Same pairs, same
    # coefficients, re-sorted by the swapped receiver.
    rev_layout, rev_src_sorted, rev_coeff_sorted = _pair_frame(
        pair_s, pair_d, coeff, num_nodes, row_block, chunk, rev_pad_to
    )
    # The reverse slot's receiver (the forward source), for the shared
    # dcomps x-gather; pads -> 0 (their coeff row is 0).
    recv_z = np.concatenate([pair_s, np.zeros((1,), np.int32)])
    rev_receiver = recv_z[rev_layout.perm].astype(np.int32)

    fwd_dedup = None
    if dedup_k and dedup_k > 1:
        fwd_dedup = _build_dedup_frame(
            pair_d, pair_s, coeff, num_nodes, row_block, chunk, dedup_k
        )

    return MergedPairLayout(
        layout=layout,
        src_sorted=src_sorted,
        coeff=coeff_sorted,
        rev_layout=rev_layout,
        rev_src_sorted=rev_src_sorted,
        rev_receiver=rev_receiver,
        rev_coeff=rev_coeff_sorted,
        num_nodes=int(num_nodes),
        num_rels=int(num_rels),
        num_pairs=int(n_pairs),
        num_edges=int(d.shape[0]),
        fwd_dedup=fwd_dedup,
    )
