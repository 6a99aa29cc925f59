"""Ranking-evaluation semantics: filtered scores, optimistic rank with
half-tie correction, MRR/Hits — per the reference contract
(``/root/reference/utils/misc.py:39-110``)."""

import jax.numpy as jnp
import numpy as np

from rgcn_tpu.train.evaluate import (
    build_filters,
    evaluate_ranking,
    ranking_metrics,
    ranks_from_scores,
)


def test_rank_exact_hand_case():
    # one row: scores [5, 3, 9, 3, 1], target idx 1 (score 3)
    # #(> 3) = 2 (5, 9); ties = 2 (two 3s) -> rank = 2 + (2-1)//2 + 1 = 3
    scores = jnp.asarray([[5.0, 3.0, 9.0, 3.0, 1.0]])
    r = ranks_from_scores(
        scores,
        jnp.asarray([1]),
        jnp.full((1, 1), 2**30, jnp.int32),
        jnp.asarray([True]),
    )
    assert int(r[0]) == 3


def test_rank_filtering():
    # filtering the best competitor promotes the target
    scores = jnp.asarray([[5.0, 3.0, 9.0, 2.0, 1.0]])
    filt = jnp.asarray([[2]])  # knock out the 9
    r = ranks_from_scores(
        scores, jnp.asarray([1]), filt, jnp.asarray([True])
    )
    assert int(r[0]) == 2  # only the 5 remains above


def test_build_filters_excludes_target():
    test = np.array([[0, 0, 1], [2, 0, 1]])
    all_triples = {(0, 0, 1), (2, 0, 1), (3, 0, 1), (0, 1, 2)}
    f = build_filters(test, all_triples, num_nodes=5)
    # head filter for (0,0,1): true heads for (p=0,o=1) are {0,2,3} minus 0
    row0 = set(f.heads[0].tolist()) - {5}
    assert row0 == {2, 3}
    row1 = set(f.heads[1].tolist()) - {5}
    assert row1 == {0, 3}


def test_evaluate_ranking_batching():
    """Batched path (incl. padded final batch) == direct computation."""
    rng = np.random.default_rng(60)
    n, t = 20, 13  # 13 test triples, batch 4 -> ragged final batch
    z = rng.normal(size=(t, n)).astype(np.float32)
    test = np.stack(
        [rng.integers(0, n, t), np.zeros(t, np.int64), rng.integers(0, n, t)],
        axis=1,
    )
    targets = test[:, 0]
    filters = np.full((t, 1), 2**30, dtype=np.int32)

    # score_fn must be traceable (the sweep runs as one scanned device
    # program): a dense (s, o) -> test-row lookup table instead of a dict.
    table = np.zeros((n, n), dtype=np.int32)
    for i, (s, _, o) in enumerate(test):
        table[s, o] = i
    table_j = jnp.asarray(table)
    z_j = jnp.asarray(z)

    def score_fn(batch):
        idx = table_j[batch[:, 0], batch[:, 2]]
        return z_j[idx]

    ranks = evaluate_ranking(score_fn, test, filters, targets, batch_size=4)

    expect = []
    for i in range(t):
        s = z[i]
        true = s[targets[i]]
        expect.append(
            int((s > true).sum()) + (int((s == true).sum()) - 1) // 2 + 1
        )
    np.testing.assert_array_equal(ranks, expect)

    mrr, hits = ranking_metrics(ranks)
    assert 0 < mrr <= 1
    assert all(0 <= h <= 1 for h in hits)
    assert hits[0] <= hits[1] <= hits[2]


def test_candidate_sweeps_match_per_triple_scores():
    """score_head/tail_candidates rows == distmult_score of the substituted
    triples (the encode-once sweep is exactly the reference's per-candidate
    scoring, utils/misc.py:77-86)."""
    import jax.numpy as jnp

    from rgcn_tpu.ops.distmult import (
        distmult_score,
        score_head_candidates,
        score_tail_candidates,
    )

    rng = np.random.default_rng(61)
    n, r, d, b = 12, 4, 6, 5
    nodes = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    rels = jnp.asarray(rng.normal(size=(r, d)).astype(np.float32))
    batch = jnp.asarray(
        np.stack(
            [rng.integers(0, n, b), rng.integers(0, r, b), rng.integers(0, n, b)],
            axis=1,
        )
    )

    heads = np.asarray(score_head_candidates(batch, nodes, rels))
    tails = np.asarray(score_tail_candidates(batch, nodes, rels))
    for i in range(b):
        for cand in range(n):
            th = jnp.asarray([[cand, batch[i, 1], batch[i, 2]]])
            tt = jnp.asarray([[batch[i, 0], batch[i, 1], cand]])
            np.testing.assert_allclose(
                heads[i, cand], float(distmult_score(th, nodes, rels)[0]),
                rtol=1e-4, atol=1e-5,
            )
            np.testing.assert_allclose(
                tails[i, cand], float(distmult_score(tt, nodes, rels)[0]),
                rtol=1e-4, atol=1e-5,
            )


def test_build_filters_matches_loop_oracle():
    """The vectorized searchsorted build produces the same per-row filter
    SETS as the Python dict-of-lists golden port (pad placement/width may
    differ; pads are dropped by the -inf scatter)."""
    from rgcn_tpu.train.evaluate import _build_filters_loop

    rng = np.random.default_rng(6)
    n, r = 40, 5
    tri = np.stack(
        [rng.integers(0, n, 600), rng.integers(0, r, 600),
         rng.integers(0, n, 600)], axis=1,
    )
    tri = np.unique(tri, axis=0)
    all_triples = {tuple(map(int, row)) for row in tri}
    test = tri[rng.choice(len(tri), 50, replace=False)]

    fast = build_filters(test, all_triples, n)
    slow = _build_filters_loop(test, all_triples, n)
    for a, b in ((fast.heads, slow.heads), (fast.tails, slow.tails)):
        assert len(a) == len(b)
        for i in range(len(a)):
            assert set(a[i].tolist()) - {n} == set(b[i].tolist()) - {n}, i


def test_build_filters_empty_and_missing_groups():
    """Test triples whose (p,o)/(s,p) group is empty get all-pad rows."""
    test = np.array([[7, 3, 8]])  # no such triples at all
    f = build_filters(test, {(0, 0, 1)}, num_nodes=10)
    assert set(f.heads[0].tolist()) == {10}
    assert set(f.tails[0].tolist()) == {10}
