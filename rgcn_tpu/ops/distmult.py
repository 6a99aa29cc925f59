"""DistMult scoring ops: per-triple SDDMM and dense candidate sweeps.

Semantics follow the reference scorer (``/root/reference/torch_rgcn/layers.py:86-98``):
``score(s, p, o) = sum_d z[s]_d * r[p]_d * z[o]_d`` plus optional per-node
subject/object and per-relation biases.

The evaluation sweep (`score_candidates_*`) is the TPU-shaped replacement for
the reference's evaluation loop, which rebuilt an ``(batch, N, 3)`` candidate
tensor and re-ran the *entire graph encoder* once per batch
(``/root/reference/utils/misc.py:77-86``). Here node embeddings are encoded
once and all ``N`` candidates are scored with one ``(B, d) @ (d, N)`` MXU
matmul per batch.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = [
    "distmult_score",
    "score_head_candidates",
    "score_tail_candidates",
]


def distmult_score(
    triples: jax.Array,
    nodes: jax.Array,
    relations: jax.Array,
    *,
    sbias: Optional[jax.Array] = None,
    pbias: Optional[jax.Array] = None,
    obias: Optional[jax.Array] = None,
) -> jax.Array:
    """Score triples ``(..., 3)`` against node/relation embeddings.

    Returns ``(...,)`` scores. Gather + fused multiply-reduce (SDDMM row
    form); XLA fuses the elementwise product into the reduction.
    """
    s = triples[..., 0]
    p = triples[..., 1]
    o = triples[..., 2]
    scores = jnp.sum(nodes[s] * relations[p] * nodes[o], axis=-1)
    if sbias is not None:
        scores = scores + sbias[s] + pbias[p] + obias[o]
    return scores


def score_head_candidates(
    batch: jax.Array,
    nodes: jax.Array,
    relations: jax.Array,
    *,
    sbias: Optional[jax.Array] = None,
    pbias: Optional[jax.Array] = None,
    obias: Optional[jax.Array] = None,
    candidate_slice=None,
) -> jax.Array:
    """Scores of every entity substituted as head: ``(B, N)``.

    ``batch`` is ``(B, 3)`` true triples; column 0 (the head) is ignored.
    ``score[b, s'] = sum_d z[s']_d * (r[p_b] * z[o_b])_d``.
    ``candidate_slice=(lo, width)`` restricts the *candidate* axis to a
    row slice of ``nodes`` (queries still index the full table) — the
    building block of the mesh-sharded sweep
    (:mod:`rgcn_tpu.dist.evaluate`); returns ``(B, width)``.
    """
    p = batch[:, 1]
    o = batch[:, 2]
    rhs = relations[p] * nodes[o]  # (B, d)
    cand = nodes
    cb = sbias
    if candidate_slice is not None:
        lo, width = candidate_slice
        cand = jax.lax.dynamic_slice_in_dim(nodes, lo, width, 0)
        if sbias is not None:
            cb = jax.lax.dynamic_slice_in_dim(sbias, lo, width, 0)
    scores = rhs @ cand.T  # (B, N|width) on the MXU
    if sbias is not None:
        scores = scores + cb[None, :] + (pbias[p] + obias[o])[:, None]
    return scores


def score_tail_candidates(
    batch: jax.Array,
    nodes: jax.Array,
    relations: jax.Array,
    *,
    sbias: Optional[jax.Array] = None,
    pbias: Optional[jax.Array] = None,
    obias: Optional[jax.Array] = None,
    candidate_slice=None,
) -> jax.Array:
    """Scores of every entity substituted as tail: ``(B, N)`` (or
    ``(B, width)`` under ``candidate_slice`` — see
    :func:`score_head_candidates`)."""
    s = batch[:, 0]
    p = batch[:, 1]
    lhs = nodes[s] * relations[p]  # (B, d)
    cand = nodes
    cb = obias
    if candidate_slice is not None:
        lo, width = candidate_slice
        cand = jax.lax.dynamic_slice_in_dim(nodes, lo, width, 0)
        if obias is not None:
            cb = jax.lax.dynamic_slice_in_dim(obias, lo, width, 0)
    scores = lhs @ cand.T
    if sbias is not None:
        scores = scores + cb[None, :] + (sbias[s] + pbias[p])[:, None]
    return scores
