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

from typing import Tuple

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
    "distmult_score_agg_ad",
    "distmult_score_spenalty_agg_ad",
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
