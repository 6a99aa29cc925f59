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

* ``d nodes``: destination-sorted layouts over the batch's subject and
  object columns are constructed *inside the backward* with the traced
  layout builder (int sort + int scatter — cheap), and the per-triple
  cotangent rows are reduced by the Pallas one-hot aggregation — no row
  scatter anywhere.
* ``d relations``: a transposed one-hot matmul
  (``onehot(p)ᵀ @ rows`` on the MXU) — the relation vocabulary is small.

The forward's gathered operands are saved as residuals so the backward
performs no fresh feature gathers besides the two layout permutations.
Bias-free scoring only (the shipped decoder configs set no biases); callers
with biases use the plain XLA autodiff path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rgcn_tpu.ops.distmult import distmult_score
from rgcn_tpu.ops.pallas_aggregate import aggregate_presorted_pallas

__all__ = ["distmult_score_agg_ad"]


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
def distmult_score_agg_ad(triples, nodes, relations):
    """``distmult_score`` (no biases) with a scatter-free backward."""
    return _fwd_impl(triples, nodes, relations)[0]


def _agg_fwd(triples, nodes, relations):
    scores, res = _fwd_impl(triples, nodes, relations)
    n = nodes.shape[0]
    return scores, (res, n, relations.shape[0])


def _rows_to_nodes(rows, idx, num_nodes):
    """Σ_{b: idx_b = n} rows[b] via in-jit layout + one-hot aggregation."""
    from rgcn_tpu.graph.dynamic import build_dst_layout_dynamic

    lay = build_dst_layout_dynamic(
        idx.astype(jnp.int32), num_nodes, row_block=128, chunk=256
    )
    rows_z = jnp.concatenate(
        [rows, jnp.zeros((1, rows.shape[-1]), rows.dtype)], axis=0
    )
    sorted_rows = rows_z[jnp.asarray(lay.perm)]
    return aggregate_presorted_pallas(sorted_rows, lay, num_nodes)


def _agg_bwd(res, g):
    (triples, zs, zo, rp), num_nodes, num_rels = res
    s = triples[..., 0]
    p = triples[..., 1]
    o = triples[..., 2]
    gb = g[:, None]

    # d relations: transposed one-hot matmul (small vocabulary)
    rows_p = gb * zs * zo  # (B, d)
    onehot_p = (
        p[:, None] == jnp.arange(num_rels, dtype=p.dtype)[None, :]
    ).astype(rows_p.dtype)
    drel = onehot_p.T @ rows_p  # (R, d) on the MXU

    # d nodes: subject and object contributions, scatter-free
    dz = _rows_to_nodes(gb * rp * zo, s, num_nodes) + _rows_to_nodes(
        gb * rp * zs, o, num_nodes
    )
    return None, dz.astype(zs.dtype), drel.astype(rp.dtype)


distmult_score_agg_ad.defvjp(_agg_fwd, _agg_bwd)
