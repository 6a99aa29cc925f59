"""Scatter-free DistMult training scorer.

Forward DistMult is gather + fused multiply-reduce (cheap). The *backward*
is where TPUs hurt: ``d nodes`` accumulates one row per batch triple at its
subject AND object — two XLA row scatter-adds over the scoring batch
(B·(1+ns) ≈ 330k rows at the WN18 configuration), and row scatters
serialize on TPU (the same pathology that motivated the sorted one-hot
aggregation kernel; see ops/pallas_aggregate.py).

This custom-VJP scorer keeps the forward identical
(``distmult_score``, reference ``torch_rgcn/layers.py:86-98``) and rebuilds
the backward TPU-first:

* ``d nodes``: the per-triple cotangent rows reduce through the Pallas
  one-hot aggregation over *precomputed* destination-sorted layouts of the
  batch's subject and object columns. The layouts MUST come from the host
  (:func:`build_batch_layouts`, overlapped in the training loop's epoch
  pipeline): building them in-jit costs two device sorts over the batch
  that measure *worse* than the scatters they replace.
* ``d relations``: a transposed one-hot matmul (``onehot(p)ᵀ @ rows`` on
  the MXU) — the relation vocabulary is small.

The forward's gathered operands are saved as residuals so the backward
performs no fresh feature gathers besides the two layout permutations.
Bias-free scoring only (the shipped decoder configs set no biases); callers
with biases — or without host layouts — use the plain XLA autodiff path.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rgcn_tpu.ops.pallas_aggregate import (
    DstLayout,
    aggregate_presorted_pallas,
    build_dst_layout,
)

__all__ = [
    "build_batch_layouts",
    "build_structured_layouts",
    "distmult_score_agg_ad",
    "distmult_score_spenalty_agg_ad",
    "distmult_structured_agg_ad",
]


def build_batch_layouts(
    batch: np.ndarray,
    num_nodes: int,
    row_block: int = 128,
    chunk: int = 256,
) -> Tuple[DstLayout, DstLayout]:
    """Host-side aggregation layouts over a scoring batch's subject and
    object columns, padded to shape-stable totals (one compile across
    epochs for a fixed batch size)."""
    batch = np.asarray(batch)
    nrb = -(-num_nodes // row_block)
    pad_to = nrb * chunk + (-(-len(batch) // chunk)) * chunk
    s_lay = build_dst_layout(
        batch[:, 0], num_nodes, row_block=row_block, chunk=chunk,
        pad_to=pad_to,
    )
    o_lay = build_dst_layout(
        batch[:, 2], num_nodes, row_block=row_block, chunk=chunk,
        pad_to=pad_to,
    )
    return s_lay, o_lay


def _fwd_impl(triples, nodes, relations):
    s = triples[..., 0]
    p = triples[..., 1]
    o = triples[..., 2]
    zs = nodes[s]
    zo = nodes[o]
    rp = relations[p]
    scores = jnp.sum(zs * rp * zo, axis=-1)
    return scores, (triples, zs, zo, rp)


@jax.custom_vjp
def distmult_score_agg_ad(triples, nodes, relations, layouts):
    """``distmult_score`` (no biases) with a scatter-free backward.

    ``layouts = (s_layout, o_layout)`` from :func:`build_batch_layouts`.
    """
    return _fwd_impl(triples, nodes, relations)[0]


def _agg_fwd(triples, nodes, relations, layouts):
    scores, res = _fwd_impl(triples, nodes, relations)
    return scores, (res, nodes.shape[0], relations.shape[0], layouts)


def _rows_to_nodes(rows, lay: DstLayout, num_nodes: int):
    rows_z = jnp.concatenate(
        [rows, jnp.zeros((1, rows.shape[-1]), rows.dtype)], axis=0
    )
    sorted_rows = rows_z[jnp.asarray(lay.perm)]
    # no input_fusion: this producer is a PERMUTATION of materialized
    # rows, the class that measured ~2x slower fused (see
    # pallas_aggregate.aggregate_sorted_pallas); only source-gather
    # producers fuse profitably
    return aggregate_presorted_pallas(sorted_rows, lay, num_nodes)


def _agg_bwd(res, g):
    (triples, zs, zo, rp), num_nodes, num_rels, (s_lay, o_lay) = res
    p = triples[..., 1]
    gb = g[:, None]

    # d relations: transposed one-hot matmul (small vocabulary)
    rows_p = gb * zs * zo  # (B, d)
    onehot_p = (
        p[:, None] == jnp.arange(num_rels, dtype=p.dtype)[None, :]
    ).astype(rows_p.dtype)
    drel = onehot_p.T @ rows_p  # (R, d) on the MXU

    # d nodes: subject and object contributions, scatter-free
    dz = _rows_to_nodes(gb * rp * zo, s_lay, num_nodes) + _rows_to_nodes(
        gb * rp * zs, o_lay, num_nodes
    )
    return None, dz.astype(zs.dtype), drel.astype(rp.dtype), None


distmult_score_agg_ad.defvjp(_agg_fwd, _agg_bwd)


# ---------------------------------------------------------------------------
# Fused score + schlichtkrull-L2 penalty. The penalty
# (``mean_b [mean_d z[s]² + mean_d r[p]² + mean_d z[o]²]``,
# reference torch_rgcn/layers.py:77-84) backpropagates ``2·z[s]``-shaped
# rows into d nodes at the SAME subject/object positions as the score —
# left to XLA autodiff it adds two more 330k-row scatter-adds per step.
# Fusing it here makes its cotangent ride the same one-hot aggregations
# for free (one fused row per triple per side).
# ---------------------------------------------------------------------------


def _score_pen_fwd_impl(triples, nodes, relations, pw):
    s = triples[..., 0]
    p = triples[..., 1]
    o = triples[..., 2]
    zs = nodes[s]
    zo = nodes[o]
    rp = relations[p]
    scores = jnp.sum(zs * rp * zo, axis=-1)
    per_row = (
        jnp.mean(zs**2, axis=-1)
        + jnp.mean(rp**2, axis=-1)
        + jnp.mean(zo**2, axis=-1)
    )
    penalty = jnp.sum(per_row * pw)
    return (scores, penalty), (triples, zs, zo, rp, pw)


@jax.custom_vjp
def distmult_score_spenalty_agg_ad(triples, nodes, relations, pw, layouts):
    """``(scores, schlichtkrull penalty)`` with a scatter-free backward.

    ``pw``: per-row penalty weights (``1/B`` for the plain mean; ``w/total``
    for padded/sharded batches — matches
    :meth:`rgcn_tpu.nn.layers.DistMult.s_penalty` semantics).
    """
    return _score_pen_fwd_impl(triples, nodes, relations, pw)[0]


def _sp_fwd(triples, nodes, relations, pw, layouts):
    out, res = _score_pen_fwd_impl(triples, nodes, relations, pw)
    return out, (res, nodes.shape[0], relations.shape[0], layouts)


def _sp_bwd(res, g):
    (triples, zs, zo, rp, pw), num_nodes, num_rels, (s_lay, o_lay) = res
    gs, gp = g  # cotangents of (scores, penalty)
    p = triples[..., 1]
    d = zs.shape[-1]
    gb = gs[:, None]
    pen_coeff = (gp * pw * (2.0 / d))[:, None]

    rows_p = gb * zs * zo + pen_coeff * rp
    onehot_p = (
        p[:, None] == jnp.arange(num_rels, dtype=p.dtype)[None, :]
    ).astype(rows_p.dtype)
    drel = onehot_p.T @ rows_p

    dz = _rows_to_nodes(gb * rp * zo + pen_coeff * zs, s_lay, num_nodes)
    dz = dz + _rows_to_nodes(gb * rp * zs + pen_coeff * zo, o_lay, num_nodes)
    return None, dz.astype(zs.dtype), drel.astype(rp.dtype), None, None


distmult_score_spenalty_agg_ad.defvjp(_sp_fwd, _sp_bwd)


# ---------------------------------------------------------------------------
# Structured negative scoring. The training batch is [positives ;
# negatives] with negatives[i] = positives[i // ns] corrupted on ONE side
# (reference utils/misc.py:174-189), so the uncorrupted side's query rows
# are repeats: precomputing q = z[s]·r[p] and k = r[p]·z[o] per positive
# costs 3·P row gathers and each negative then needs only its fresh
# corrupted-entity row — 3P + Ns gathers instead of 3(P + Ns) (2.5× fewer
# at ns = 10; row gathers are latency-bound). The backward pre-reduces the
# uncorrupted-side and relation cotangents densely over the ns axis, so
# two of the three aggregations shrink from B rows to P rows.
# ---------------------------------------------------------------------------


def build_structured_layouts(
    positives: np.ndarray,
    corrupt_ent: np.ndarray,
    num_nodes: int,
    row_block: int = 128,
    chunk: int = 256,
    sorted_corrupt: bool = False,
    corrupt_head: Optional[np.ndarray] = None,
    p_row_block: Optional[int] = None,
    p_chunk: Optional[int] = None,
):
    """Host layouts for the structured backward: corrupted entities (Ns),
    positives' subjects (P), positives' objects (P).

    ``p_row_block`` / ``p_chunk`` set the geometry of the two P-sized
    (subject/object) layouts separately from the Ns-sized corrupted-entity
    layout: their static slot bound is ``nrb * chunk + ceil(P/chunk) *
    chunk``, so at P = 30k the default 320-row-block geometry is ~73%
    padding — larger row blocks cut the bound ~2.8x for a small one-hot
    FLOP increase (measured net win, benchmarks/probe_lp_bwd.py). Defaults
    preserve the corrupted-side geometry.

    ``sorted_corrupt=True`` (requires ``corrupt_head``) appends
    host-gathered slot index arrays ``(ce_sorted, qk_idx_sorted)`` for the
    corrupted-entity side, enabling the *sorted-order* backward: instead of
    materializing the (Ns, d) cotangent rows in batch order and permuting
    them, the backward runs one two-table weighted one-hot aggregation
    whose source gather (a fused gather from the in-jit ``[q ; k ; nodes]``
    concatenation) computes inside the kernel's input pipeline — the row
    tensor never exists in HBM. The corruption-side selection is folded
    into the query index host-side (``parent + P`` selects the
    head-corruption row).
    """
    positives = np.asarray(positives)
    corrupt_ent = np.asarray(corrupt_ent)
    p_rb = p_row_block or row_block
    p_ch = p_chunk or chunk

    def lay(ids, rb, ch):
        nrb = -(-num_nodes // rb)
        pad_to = nrb * ch + (-(-len(ids) // ch)) * ch
        return build_dst_layout(
            ids, num_nodes, row_block=rb, chunk=ch, pad_to=pad_to
        )

    c_lay = lay(corrupt_ent, row_block, chunk)
    s_lay = lay(positives[:, 0], p_rb, p_ch)
    o_lay = lay(positives[:, 2], p_rb, p_ch)
    if not sorted_corrupt:
        return c_lay, s_lay, o_lay
    if corrupt_head is None:
        raise ValueError("sorted_corrupt=True requires corrupt_head")
    return c_lay, s_lay, o_lay, _sorted_corrupt_aux(
        c_lay, corrupt_ent, np.asarray(corrupt_head), len(positives)
    )


def _sorted_corrupt_aux(c_lay: DstLayout, corrupt_ent: np.ndarray,
                        corrupt_head: np.ndarray, p_count: int):
    """(ce_sorted, qk_idx_sorted) for the sorted-order corrupted-entity
    backward. Pads -> row 0 (their slot weights are zero through the
    perm-gathered cotangents)."""
    ns_total = corrupt_ent.shape[0]
    perm = c_lay.perm.astype(np.int64)
    valid = perm < ns_total
    safe = np.where(valid, perm, 0)
    ce_sorted = np.where(valid, np.take(corrupt_ent, safe), 0)
    ns = ns_total // p_count
    parent = safe // ns
    qk_idx = parent + p_count * np.take(
        corrupt_head.astype(np.int64), safe
    )
    qk_idx = np.where(valid, qk_idx, 0)
    return ce_sorted.astype(np.int32), qk_idx.astype(np.int32)


def _structured_fwd_impl(positives, corrupt_head, corrupt_ent, nodes,
                         relations, pw):
    p_count = positives.shape[0]
    ns = corrupt_ent.shape[0] // p_count
    d = nodes.shape[-1]

    s = positives[:, 0]
    p = positives[:, 1]
    o = positives[:, 2]
    zs = nodes[s]
    zo = nodes[o]
    rp = relations[p]
    pos_scores = jnp.sum(zs * rp * zo, axis=-1)

    q = zs * rp  # tail-corruption query
    k = rp * zo  # head-corruption query
    zc = nodes[corrupt_ent].reshape(p_count, ns, d)
    ch = corrupt_head.reshape(p_count, ns)
    qk = jnp.where(ch[..., None], k[:, None, :], q[:, None, :])
    neg_scores = jnp.sum(qk * zc, axis=-1)  # (P, ns)
    scores = jnp.concatenate([pos_scores, neg_scores.reshape(-1)])

    # schlichtkrull penalty, structured: per-parent means reused.
    # (Computing these as gathers of per-NODE means — n2[corrupt_ent] —
    # was measured 2.2 ms SLOWER: 300k SCALAR gathers are row-latency
    # bound like any gather, while these means ride the already-
    # materialized rows' bandwidth. benchmarks/probe_lp_step.py.)
    a2 = jnp.mean(zs**2, axis=-1)
    b2 = jnp.mean(rp**2, axis=-1)
    c2 = jnp.mean(zo**2, axis=-1)
    zc2 = jnp.mean(zc**2, axis=-1)  # (P, ns)
    pos_rows = a2 + b2 + c2
    neg_rows = zc2 + jnp.where(
        ch, (b2 + c2)[:, None], (a2 + b2)[:, None]
    )
    pw_pos = pw[:p_count]
    pw_neg = pw[p_count:].reshape(p_count, ns)
    penalty = jnp.sum(pos_rows * pw_pos) + jnp.sum(neg_rows * pw_neg)
    return (scores, penalty), (
        positives, ch, zs, zo, rp, q, k, zc, pw_pos, pw_neg
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _st_core(
    positives, corrupt_head, corrupt_ent, nodes, relations, pw, layouts,
    bwd_dtype,
):
    return _structured_fwd_impl(
        positives, corrupt_head, corrupt_ent, nodes, relations, pw
    )[0]


def _st_fwd(positives, corrupt_head, corrupt_ent, nodes, relations, pw,
            layouts, bwd_dtype):
    out, res = _structured_fwd_impl(
        positives, corrupt_head, corrupt_ent, nodes, relations, pw
    )
    if bwd_dtype is not None:
        # The (P, ns, d) corrupted-entity rows are the largest residual and
        # are consumed only by the backward's dense ns-reductions and row
        # products — storing them narrow halves both the residual HBM and
        # the backward's reads. Forward outputs above are computed at f32.
        (positives_, ch, zs, zo, rp, q, k, zc, pw_pos, pw_neg) = res
        res = (positives_, ch, zs, zo, rp, q, k, zc.astype(bwd_dtype),
               pw_pos, pw_neg)
    return out, (res, nodes, relations.shape[0], layouts)


def _st_bwd(bwd_dtype, res, g):
    (positives, ch, zs, zo, rp, q, k, zc, pw_pos, pw_neg), nodes, \
        num_rels, layouts = res
    c_lay, s_lay, o_lay = layouts[:3]
    num_nodes = nodes.shape[0]
    gs, gp = g
    p_count, ns, d = zc.shape
    p = positives[:, 1]
    gs_pos = gs[:p_count]
    gs_neg = gs[p_count:].reshape(p_count, ns)
    pc = gp * (2.0 / d)

    chf = ch[..., None].astype(zc.dtype)

    # 1) corrupted entities: one fused row per negative (score + penalty)
    if len(layouts) == 4:
        # sorted-order path: the cotangent row of slot j is
        #   ge_j · qk2[idx_j]  +  (pc·pw_j) · nodes[ce_j]
        # and aggregation is linear, so instead of building the (L, d) row
        # tensor (306 MB at WN18 scale — its materialize+permute was the
        # measured 8.6 ms wall of the step, benchmarks/probe_lp_bwd.py)
        # ONE two-table weighted one-hot aggregation (nb=2, sum_bases)
        # gathers both terms' rows from the in-jit ``[q ; k ; nodes]``
        # concatenation inside the kernel's input pipeline (input_fusion):
        # the rows never exist in HBM. Same per-slot products, per-term
        # aggregation order -> allclose at f32 (tests/test_basis.py).
        from rgcn_tpu.ops.pallas_basis import weighted_aggregate_pallas

        ce_sorted, qk_idx = layouts[3]
        L = c_lay.perm.shape[0]
        perm = jnp.asarray(c_lay.perm)
        ge = jnp.concatenate(
            [gs_neg.reshape(-1), jnp.zeros((1,), gs_neg.dtype)]
        )[perm]
        pwz = jnp.concatenate(
            [pw_neg.reshape(-1), jnp.zeros((1,), pw_neg.dtype)]
        )[perm]
        # Narrow-backward option: gather cost tracks TABLE SIZE (CLAUDE.md
        # / probe_gather5), so a bf16 table halves both the per-row gather
        # latency class and the fused rows' VMEM bytes; the kernel still
        # accumulates at f32 (preferred_element_type) into an f32 output.
        tdt = q.dtype if bwd_dtype is None else jnp.dtype(bwd_dtype)
        table = jnp.concatenate(
            [q.astype(tdt), k.astype(tdt), nodes.astype(tdt)], axis=0
        )  # (2P + N, d)
        cidx = jnp.concatenate(
            [jnp.asarray(qk_idx), jnp.asarray(ce_sorted) + 2 * p_count]
        )
        xg2 = table[cidx].reshape(2, L, d)
        w2 = jnp.stack([ge, pc * pwz])  # (2, L)
        dz = weighted_aggregate_pallas(
            xg2, w2, c_lay, num_nodes, sum_bases=True,
            compute_dtype=(None if bwd_dtype is None else tdt),
            input_fusion=True,
        )[0]
    else:
        qk = jnp.where(ch[..., None], k[:, None, :], q[:, None, :])
        rows_c = gs_neg[..., None] * qk + (pc * pw_neg)[..., None] * zc
        dz = _rows_to_nodes(rows_c.reshape(-1, d), c_lay, num_nodes)

    # 2) positives' subjects: score (pos + tail-corrupt negs via dense
    #    ns-reduction) + penalty (pos + tail-corrupt neg uncorrupted side)
    gzc_tail = jnp.sum((1.0 - chf) * gs_neg[..., None] * zc, axis=1)
    pw_tail = jnp.sum(jnp.where(ch, 0.0, pw_neg), axis=1)
    s_rows = (
        gs_pos[:, None] * rp * zo
        + rp * gzc_tail
        + (pc * (pw_pos + pw_tail))[:, None] * zs
    )
    dz = dz + _rows_to_nodes(s_rows, s_lay, num_nodes)

    # 3) positives' objects: symmetric (head-corrupt negs)
    gzc_head = jnp.sum(chf * gs_neg[..., None] * zc, axis=1)
    pw_head = jnp.sum(jnp.where(ch, pw_neg, 0.0), axis=1)
    o_rows = (
        gs_pos[:, None] * rp * zs
        + rp * gzc_head
        + (pc * (pw_pos + pw_head))[:, None] * zo
    )
    dz = dz + _rows_to_nodes(o_rows, o_lay, num_nodes)

    # d relations: P rows (negatives pre-reduced over ns)
    pw_all = pw_pos + jnp.sum(pw_neg, axis=1)
    rel_rows = (
        gs_pos[:, None] * zs * zo
        + zo * gzc_head
        + zs * gzc_tail
        + (pc * pw_all)[:, None] * rp
    )
    onehot_p = (
        p[:, None] == jnp.arange(num_rels, dtype=p.dtype)[None, :]
    ).astype(rel_rows.dtype)
    drel = onehot_p.T @ rel_rows

    return (None, None, None, dz.astype(zs.dtype), drel.astype(rp.dtype),
            None, None)


_st_core.defvjp(_st_fwd, _st_bwd)


def distmult_structured_agg_ad(
    positives, corrupt_head, corrupt_ent, nodes, relations, pw, layouts,
    bwd_dtype=None,
):
    """``(scores [positives; negatives], schlichtkrull penalty)`` for a
    structured training batch, with the fully scatter-free backward.

    ``layouts = (corrupt_layout, subj_layout, obj_layout)`` from
    :func:`build_structured_layouts`; ``pw`` = per-row penalty weights
    over the assembled batch (positives first).

    ``bwd_dtype`` (e.g. ``jnp.bfloat16``) narrows the BACKWARD only: the
    sorted two-table aggregation's ``[q ; k ; nodes]`` gather table and
    the ``(P, ns, d)`` corrupted-row residual are stored/read at that
    width (f32 accumulation throughout). The forward scores and penalty
    are bit-identical to the f32 path; ``d nodes``/``d relations`` lose
    mantissa — an opt-in speed/precision trade (config:
    ``decoder.bwd_dtype``), default full f32.

    ``layouts=None``: layout-free mode for fully in-jit steps (no host
    pipeline to build the sorted aggregation layouts, and building them
    in-jit costs device sorts that outweigh the scatters they remove —
    measured, see train/link_prediction.py). The forward is the SAME
    structured expression — 3P + Ns query-row gathers instead of the
    materialized batch's 3(P + Ns) — and the backward is plain JAX AD
    (XLA scatter-adds over the structured row count). Forward scores are
    bit-identical to the layout path; gradients agree to f32
    reassociation (tests/test_basis.py). Layout-free mode has no sorted
    aggregation to narrow, so ``bwd_dtype`` does not apply — a set value
    warns and is ignored rather than silently changing semantics."""
    if layouts is None:
        if bwd_dtype is not None:
            import warnings

            warnings.warn(
                "distmult_structured_agg_ad: bwd_dtype only applies with "
                "host-built layouts; layout-free (layouts=None) backward "
                "is plain f32 AD — ignoring bwd_dtype",
                stacklevel=2,
            )
        return _structured_fwd_impl(
            positives, corrupt_head, corrupt_ent, nodes, relations, pw
        )[0]
    return _st_core(
        positives, corrupt_head, corrupt_ent, nodes, relations, pw,
        layouts, None if bwd_dtype is None else jnp.dtype(bwd_dtype),
    )
