"""Direct unit tests of the LP positive-triple samplers.

``edge_neighborhood`` is the one component whose implementation deliberately
deviates from the reference (``/root/reference/utils/misc.py:125-172``): it
draws ``chunk`` edges per weight refresh instead of one. These tests pin

* the invariants both processes share (exact sample size, no duplicate
  edges, samples drawn from the input set),
* the vertex-expansion property at ``chunk=1`` (each sampled edge touches a
  previously-seen vertex on a connected graph),
* statistical equivalence of ``chunk=1`` to a faithful replica of the
  reference's per-draw loop (per-edge inclusion frequencies), and
* the incidence-structure cache's content-fingerprint invalidation (a
  different same-shape graph on a recycled buffer address must rebuild).
"""

import numpy as np
import pytest

from rgcn_tpu.train import samplers
from rgcn_tpu.train.samplers import (
    edge_neighborhood,
    select_sampler,
    uniform_sampling,
)


def _connected_triples(rng, num_nodes=30, extra_edges=60, num_rels=4):
    """A connected multigraph: a random spanning tree + extra edges."""
    rows = []
    for v in range(1, num_nodes):
        u = int(rng.integers(0, v))
        rows.append((u, int(rng.integers(0, num_rels)), v))
    for _ in range(extra_edges):
        s, o = rng.integers(0, num_nodes, 2)
        while s == o:
            s, o = rng.integers(0, num_nodes, 2)
        rows.append((int(s), int(rng.integers(0, num_rels)), int(o)))
    t = np.unique(np.asarray(rows, dtype=np.int64), axis=0)
    return t


def _edge_key(triples):
    return triples[:, 0] * 1_000_000 + triples[:, 1] * 1_000 + triples[:, 2]


def test_uniform_exact_size_no_duplicates(rng):
    triples = _connected_triples(rng)
    out = uniform_sampling(triples, 20, np.random.default_rng(1))
    assert out.shape == (20, 3)
    assert len(np.unique(_edge_key(out))) == 20
    # every sampled row is a real triple
    assert set(_edge_key(out)) <= set(_edge_key(triples))


@pytest.mark.parametrize("chunk", [1, 7, 2048])
def test_edge_neighborhood_exact_size_no_duplicates(rng, chunk):
    triples = _connected_triples(rng)
    out = edge_neighborhood(
        triples, 25, np.random.default_rng(2), chunk=chunk
    )
    assert out.shape == (25, 3)
    assert len(np.unique(_edge_key(out))) == 25
    assert set(_edge_key(out)) <= set(_edge_key(triples))


def test_edge_neighborhood_returns_all_when_sample_covers_graph(rng):
    triples = _connected_triples(rng, num_nodes=10, extra_edges=5)
    out = edge_neighborhood(
        triples, len(triples) + 10, np.random.default_rng(0)
    )
    np.testing.assert_array_equal(out, triples)


def test_edge_neighborhood_seen_vertex_expansion(rng):
    """On a connected graph at chunk=1, every edge after the first must
    touch a vertex already seen when it was drawn (the defining property of
    the weighted vertex-expansion process; chunks > 1 may seed several
    expansion fronts in their first refresh, so strict in-order expansion
    is a chunk=1 property)."""
    triples = _connected_triples(rng, num_nodes=40, extra_edges=80)
    out = edge_neighborhood(
        triples, 30, np.random.default_rng(3), chunk=1
    )
    seen = set(out[0, [0, 2]].tolist())
    for s, _, o in out[1:]:
        assert s in seen or o in seen
        seen.add(int(s))
        seen.add(int(o))


def _reference_process(triples, sample_size, num_nodes, rng):
    """Faithful replica of the reference's per-draw loop
    (``/root/reference/utils/misc.py:125-172``), on a seeded Generator."""
    adj = [[] for _ in range(num_nodes)]
    for i, (s, _, o) in enumerate(triples):
        adj[s].append((i, o))
        adj[o].append((i, s))
    degrees = np.array([len(a) for a in adj])
    sample_counts = degrees.copy()
    picked = np.zeros(len(triples), dtype=bool)
    seen = np.zeros(num_nodes, dtype=bool)
    edges = np.zeros(sample_size, dtype=np.int64)
    for i in range(sample_size):
        weights = sample_counts * seen
        if weights.sum() == 0:
            weights = np.ones_like(weights)
            weights[sample_counts == 0] = 0
        probs = weights / weights.sum()
        v = rng.choice(num_nodes, p=probs)
        seen[v] = True
        e, other = adj[v][rng.integers(0, len(adj[v]))]
        while picked[e]:
            e, other = adj[v][rng.integers(0, len(adj[v]))]
        edges[i] = e
        picked[e] = True
        sample_counts[v] -= 1
        sample_counts[other] -= 1
        seen[other] = True
    return triples[edges]


def test_chunk1_statistically_matches_reference_process(rng):
    """chunk=1 runs the same vertex-expansion process as the reference's
    per-draw loop (only the picked-edge retry differs: drop-and-refresh vs
    retry-within-vertex). Per-edge inclusion frequencies over many seeded
    runs must agree."""
    triples = _connected_triples(rng, num_nodes=25, extra_edges=55)
    n_edges = len(triples)
    sample_size = 20
    trials = 300

    freq_ours = np.zeros(n_edges)
    freq_ref = np.zeros(n_edges)
    key_to_idx = {int(k): i for i, k in enumerate(_edge_key(triples))}
    for t in range(trials):
        ours = edge_neighborhood(
            triples, sample_size, np.random.default_rng(1000 + t), chunk=1
        )
        ref = _reference_process(
            triples, sample_size, 25, np.random.default_rng(5000 + t)
        )
        for k in _edge_key(ours):
            freq_ours[key_to_idx[int(k)]] += 1
        for k in _edge_key(ref):
            freq_ref[key_to_idx[int(k)]] += 1
    freq_ours /= trials
    freq_ref /= trials

    diff = np.abs(freq_ours - freq_ref)
    assert diff.mean() < 0.04, (diff.mean(), diff.max())
    assert diff.max() < 0.15, (diff.mean(), diff.max())


def test_incidence_cache_fingerprint_invalidation(rng):
    """A different graph with the same (address, shape, num_nodes) key —
    the freed-allocation hazard — must not reuse stale structure."""
    triples_a = _connected_triples(rng, num_nodes=20, extra_edges=30)
    samplers._INCIDENCE_CACHE.clear()
    inc_a = samplers._incidence(triples_a, 20)
    assert len(samplers._INCIDENCE_CACHE) == 1

    # Poison the cache: different triples under triples_b's own key, as if
    # triples_b landed on a freed buffer previously cached for triples_a.
    triples_b = triples_a[::-1].copy()  # same shape, different content
    key_b = (
        triples_b.__array_interface__["data"][0], triples_b.shape, 20,
    )
    fp_a = samplers._fingerprint(triples_a)
    samplers._INCIDENCE_CACHE.clear()
    samplers._INCIDENCE_CACHE[key_b] = (fp_a, inc_a)

    inc_b = samplers._incidence(triples_b, 20)
    # stale structure rejected: the rebuilt incidence reflects triples_b
    inc_b_fresh_edge, inc_b_starts, inc_b_degrees = inc_b
    expect = np.zeros(20, dtype=np.int64)
    np.add.at(expect, triples_b[:, 0], 1)
    np.add.at(expect, triples_b[:, 2], 1)
    np.testing.assert_array_equal(inc_b_degrees, expect)


def test_incidence_cache_hit_on_same_array(rng):
    triples = _connected_triples(rng, num_nodes=20, extra_edges=30)
    samplers._INCIDENCE_CACHE.clear()
    a = samplers._incidence(triples, 20)
    b = samplers._incidence(triples, 20)
    assert a is b  # cached, not rebuilt


def test_select_sampler_dispatch():
    assert select_sampler("Uniform") is uniform_sampling
    assert select_sampler("edge-neighborhood") is edge_neighborhood
    with pytest.raises(NotImplementedError):
        select_sampler("bogus")
