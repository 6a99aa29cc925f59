"""Link-prediction ranking evaluation (filtered MRR / Hits@k) and NC accuracy.

Reference: ``/root/reference/utils/misc.py:29-110``. Semantics preserved:

* head and tail prediction over all ``N`` candidate entities;
* filtered setting removes known-true non-target triples by setting their
  scores to ``-inf`` (``misc.py:39-58``);
* "optimistic" rank with half-tie correction:
  ``rank = #(score > true) + (#(score == true) - 1) // 2 + 1``
  (``misc.py:94-102``).

TPU re-design: the reference re-ran the full graph encoder for every
evaluation batch and built an ``(batch, N, 3)`` candidate tensor
(``misc.py:77-86``); here the encoder runs **once**, candidate scores are one
``(B, d) @ (d, N)`` matmul per batch (see :mod:`rgcn_tpu.ops.distmult`), and
the variable-length filter lists become a padded index matrix applied with a
dropped-out-of-bounds scatter — all static shapes.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, Iterable, List, Sequence, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "RankingFilters",
    "generate_true_dict",
    "build_filters",
    "ranks_from_scores",
    "evaluate_ranking",
    "ranking_metrics",
    "accuracy",
]


def generate_true_dict(all_triples):
    """``(p, o) -> [s]`` and ``(s, p) -> [o]`` maps over all true triples
    (reference ``utils/misc.py:29-37``); :func:`build_filters` consumes the
    same information in padded-tensor form for the TPU path."""
    heads: Dict[Tuple[int, int], List[int]] = {}
    tails: Dict[Tuple[int, int], List[int]] = {}
    for s, p, o in all_triples:
        heads.setdefault((int(p), int(o)), []).append(int(s))
        tails.setdefault((int(s), int(p)), []).append(int(o))
    return heads, tails


@dataclass(frozen=True)
class RankingFilters:
    """Padded known-true indices per test triple (pad value = num_nodes,
    which is out of range for an ``(B, N)`` score row and therefore dropped
    by the masked scatter)."""

    heads: np.ndarray  # (T, Lh) int32 — true heads s' != s for (·, p, o)
    tails: np.ndarray  # (T, Lt) int32 — true tails o' != o for (s, p, ·)


def build_filters(
    test: np.ndarray,
    all_triples: Set[Tuple[int, int, int]],
    num_nodes: int,
) -> RankingFilters:
    """Precompute the filtered-setting index matrices (host-side, once)."""
    heads_by_po: Dict[Tuple[int, int], List[int]] = {}
    tails_by_sp: Dict[Tuple[int, int], List[int]] = {}
    for s, p, o in all_triples:
        heads_by_po.setdefault((p, o), []).append(s)
        tails_by_sp.setdefault((s, p), []).append(o)

    def pad(rows: List[List[int]]) -> np.ndarray:
        width = max((len(r) for r in rows), default=0)
        width = max(width, 1)
        out = np.full((len(rows), width), num_nodes, dtype=np.int32)
        for i, r in enumerate(rows):
            out[i, : len(r)] = r
        return out

    head_rows, tail_rows = [], []
    for s, p, o in test:
        head_rows.append(
            [x for x in heads_by_po.get((int(p), int(o)), ()) if x != s]
        )
        tail_rows.append(
            [x for x in tails_by_sp.get((int(s), int(p)), ()) if x != o]
        )
    return RankingFilters(heads=pad(head_rows), tails=pad(tail_rows))


def ranks_from_scores(
    scores: jax.Array,  # (B, N) float32
    targets: jax.Array,  # (B,)
    filters: jax.Array,  # (B, L) indices to -inf (num_nodes = pad, dropped)
    valid: jax.Array,  # (B,) bool — padding rows of the last batch
) -> jax.Array:
    """Optimistic rank with half-tie correction (``misc.py:94-102``)."""
    bsz = scores.shape[0]
    rows = jnp.arange(bsz)[:, None]
    scores = scores.at[rows, filters].set(-jnp.inf, mode="drop")
    true_scores = scores[jnp.arange(bsz), targets]
    raw = jnp.sum(scores > true_scores[:, None], axis=1)
    ties = jnp.sum(scores == true_scores[:, None], axis=1)
    ranks = raw + (ties - 1) // 2 + 1
    return jnp.where(valid, ranks, 0)


def evaluate_ranking(
    score_fn: Callable[[jax.Array], jax.Array],
    test: np.ndarray,
    filters: np.ndarray,
    targets: np.ndarray,
    batch_size: int = 512,
) -> np.ndarray:
    """Rank every test triple in one direction.

    ``score_fn(batch (B,3)) -> (B, N)`` candidate scores (jitted by the
    caller; fixed batch size — the final batch is padded and masked).
    """
    n = len(test)
    ranks = np.zeros(n, dtype=np.int64)
    width = filters.shape[1]
    for fr in range(0, n, batch_size):
        to = min(fr + batch_size, n)
        bsz = to - fr
        batch = np.zeros((batch_size, 3), dtype=np.int64)
        batch[:bsz] = test[fr:to]
        # pad rows use a huge index: out of range for (B, N) scores, so the
        # -inf scatter drops it (negative pads would be OOB too, but the
        # semantics of negative indices differ across scatter modes)
        filt = np.full((batch_size, width), 2**30, dtype=np.int32)
        filt[:bsz] = filters[fr:to]
        tgt = np.zeros((batch_size,), dtype=np.int64)
        tgt[:bsz] = targets[fr:to]
        valid = np.zeros((batch_size,), dtype=bool)
        valid[:bsz] = True

        scores = score_fn(jnp.asarray(batch))
        r = ranks_from_scores(
            scores, jnp.asarray(tgt), jnp.asarray(filt), jnp.asarray(valid)
        )
        ranks[fr:to] = np.asarray(r)[:bsz]
    return ranks


def ranking_metrics(
    ranks: Sequence[int], hits_at_k: Iterable[int] = (1, 3, 10)
) -> Tuple[float, Tuple[float, ...]]:
    ranks = np.asarray(ranks, dtype=np.float64)
    mrr = float(np.mean(1.0 / ranks))
    hits = tuple(float(np.mean(ranks <= k)) for k in hits_at_k)
    return mrr, hits


def accuracy(pred: np.ndarray, labels: np.ndarray) -> float:
    """Classification accuracy in percent (sklearn ``accuracy_score`` × 100,
    as printed by ``experiments/classify_nodes.py:137-140``)."""
    return float(np.mean(np.asarray(pred) == np.asarray(labels)) * 100.0)
