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


def _build_filters_loop(
    test: np.ndarray,
    all_triples: Set[Tuple[int, int, int]],
    num_nodes: int,
) -> RankingFilters:
    """Python-loop reference implementation (the golden port of the
    reference's dict-of-lists filtering, ``utils/misc.py:39-58``) — kept as
    the oracle for :func:`build_filters`, which produces the same padded
    rows (as sets; pad placement differs) ~50x faster via sort+searchsorted
    group lookup."""
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


def build_filters(
    test: np.ndarray,
    all_triples: Set[Tuple[int, int, int]],
    num_nodes: int,
) -> RankingFilters:
    """Precompute the filtered-setting index matrices (host-side, once).

    Vectorized group lookup: sort all true triples by the (key-pair) of
    each direction, then each test row's filter list is one
    ``searchsorted`` range. With ``check_every``-periodic evaluation over
    thousands of epochs this build recurs per process start — the Python
    dict-of-lists version cost ~2-3.5 s at WN18 scale, this runs in tens
    of milliseconds with identical row contents
    (``tests/test_evaluate.py``)."""
    test = np.asarray(test, dtype=np.int64)
    tri = np.asarray(list(all_triples), dtype=np.int64)
    if tri.size == 0:
        tri = np.zeros((0, 3), dtype=np.int64)

    def direction(key_cols, val_col, test_keys, test_target):
        key = tri[:, key_cols[0]] * (num_nodes + 1) + tri[:, key_cols[1]]
        order = np.argsort(key, kind="stable")
        key_sorted = key[order]
        vals_sorted = tri[order, val_col]
        tk = test_keys[:, 0] * (num_nodes + 1) + test_keys[:, 1]
        lo = np.searchsorted(key_sorted, tk, side="left")
        hi = np.searchsorted(key_sorted, tk, side="right")
        # Ragged assembly: one hub group can be 100x the typical filter
        # length, so dense (T, max_width) intermediates waste ~100x the
        # work; build the ~Σ lens flat entries and scatter once.
        lens = hi - lo
        width = max(int(lens.max(initial=0)), 1)
        total = int(lens.sum())
        row_of = np.repeat(np.arange(len(tk)), lens)
        starts = np.cumsum(lens) - lens
        pos_in_row = np.arange(total) - starts[row_of]
        vals = vals_sorted[lo[row_of] + pos_in_row]
        # exclude the target itself (reference: `if x != s` / `!= o`)
        vals = np.where(vals == test_target[row_of], num_nodes, vals)
        out = np.full((len(tk), width), num_nodes, dtype=np.int32)
        out[row_of, pos_in_row] = vals
        return out

    heads = direction(
        (1, 2), 0, test[:, 1:3], test[:, 0]
    )  # (p, o) -> true s', excluding s
    tails = direction(
        (0, 1), 2, test[:, 0:2], test[:, 2]
    )  # (s, p) -> true o', excluding o
    return RankingFilters(heads=heads, tails=tails)


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


def batched_eval_arrays(
    test: np.ndarray,
    filters: np.ndarray,
    targets: np.ndarray,
    batch_size: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Pad + reshape one ranking direction into scan-ready batch tensors:
    ``(nb, B, 3) triples, (nb, B, L) filters, (nb, B) targets, (nb, B)
    valid``. Pad filter rows use a huge index: out of range for ``(B, N)``
    scores, so the ``-inf`` scatter drops it (negative pads would be OOB
    too, but the semantics of negative indices differ across scatter
    modes)."""
    n = len(test)
    nb = -(-n // batch_size)
    total = nb * batch_size
    width = filters.shape[1]

    batch = np.zeros((total, 3), dtype=np.int64)
    batch[:n] = test
    filt = np.full((total, width), 2**30, dtype=np.int32)
    filt[:n] = filters
    tgt = np.zeros((total,), dtype=np.int64)
    tgt[:n] = targets
    valid = np.zeros((total,), dtype=bool)
    valid[:n] = True
    return (
        batch.reshape(nb, batch_size, 3),
        filt.reshape(nb, batch_size, width),
        tgt.reshape(nb, batch_size),
        valid.reshape(nb, batch_size),
    )


def scan_ranks(
    score_fn: Callable[[jax.Array], jax.Array],
    batches: jax.Array,  # (nb, B, 3)
    filts: jax.Array,  # (nb, B, L)
    tgts: jax.Array,  # (nb, B)
    valids: jax.Array,  # (nb, B)
) -> jax.Array:
    """All-batches ranking as one ``lax.scan`` — a single device program
    instead of a host loop with one dispatch round-trip per batch (the
    reference loops 16-triple batches through the *full encoder*,
    ``utils/misc.py:77-86``; even encode-once pays ~tens of ms dispatch
    latency per batch on networked backends). Traceable; callers jit."""

    def body(carry, xs):
        batch, filt, tgt, valid = xs
        scores = score_fn(batch)
        return carry, ranks_from_scores(scores, tgt, filt, valid)

    _, ranks = jax.lax.scan(body, None, (batches, filts, tgts, valids))
    return ranks


def evaluate_ranking(
    score_fn: Callable[[jax.Array], jax.Array],
    test: np.ndarray,
    filters: np.ndarray,
    targets: np.ndarray,
    batch_size: int = 512,
) -> np.ndarray:
    """Rank every test triple in one direction.

    ``score_fn(batch (B,3)) -> (B, N)`` candidate scores; traceable (the
    whole sweep runs as one scanned device program)."""
    n = len(test)
    batches, filts, tgts, valids = batched_eval_arrays(
        test, filters, targets, batch_size
    )
    ranks = scan_ranks(
        score_fn,
        jnp.asarray(batches),
        jnp.asarray(filts),
        jnp.asarray(tgts),
        jnp.asarray(valids),
    )
    return np.asarray(ranks).reshape(-1)[:n]


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
