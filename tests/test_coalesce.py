"""Edge coalescing (graph/coalesce.py + the merged basis path): merging
parallel (dst, src) pairs across relations must be an exact reassociation —
outputs and all gradients match the unmerged aggregation-first kernel, and
reciprocal graphs (the WN18 structure the merge exploits) actually shrink
the slot count."""

import jax
import jax.numpy as jnp
import numpy as np

from rgcn_tpu.graph.coalesce import build_merged_layout
from rgcn_tpu.graph.structure import build_edge_set
from rgcn_tpu.ops.pallas_basis import (
    rel_spmm_basis_ad,
    rel_spmm_basis_merged_ad,
)
from tests.conftest import make_random_triples


def _reciprocal_triples(rng, num_nodes, num_rels, num_base, reciprocity=0.8):
    """Base triples plus reciprocal counterparts under paired relations
    ((2k, 2k+1) are inverses), mimicking WN18's structure."""
    assert num_rels % 2 == 0
    t = make_random_triples(rng, num_nodes, num_rels, num_base)
    flip = rng.random(len(t)) < reciprocity
    partner = t[flip][:, [2, 1, 0]].copy()
    partner[:, 1] = partner[:, 1] ^ 1  # 2k <-> 2k+1
    return np.unique(np.concatenate([t, partner], axis=0), axis=0)


def _merged_from_es(es, row_block=16, chunk=32):
    return build_merged_layout(
        es.dst, es.src, es.rel, es.val, es.num_nodes, es.num_rels,
        row_block=row_block, chunk=chunk,
    )


def _setup(triples, n, r, din=12, dout=20, nb=3, seed=2):
    rng = np.random.default_rng(seed)
    es = build_edge_set(triples, n, r, tile_size=16, with_dst_layout=True)
    x = jnp.asarray(rng.normal(size=(n, din)).astype(np.float32))
    bases = jnp.asarray(rng.normal(size=(nb, din, dout)).astype(np.float32))
    comps = jnp.asarray(rng.normal(size=(2 * r, nb)).astype(np.float32))
    return es, x, bases, comps


def test_merged_layout_invariants():
    rng = np.random.default_rng(0)
    n, r = 50, 6
    triples = _reciprocal_triples(rng, n, r, 250, reciprocity=0.9)
    es = build_edge_set(triples, n, r, tile_size=16, with_dst_layout=True)
    m = _merged_from_es(es)

    # a reciprocal graph genuinely merges: strictly fewer pairs than edges
    assert m.num_edges == es.num_edges
    assert m.num_pairs < m.num_edges
    # total mass is preserved: sum of coefficients == sum of edge values
    np.testing.assert_allclose(
        m.coeff.sum(), np.asarray(es.val).sum(), rtol=1e-6
    )
    np.testing.assert_allclose(
        m.rev_coeff.sum(), np.asarray(es.val).sum(), rtol=1e-6
    )
    # both frames cover the same pairs
    assert m.rev_layout.perm.shape[0] >= m.num_pairs

    # a parallel-free graph is a no-op merge
    t1 = np.stack([[0, 1, 2, 3], [0, 1, 2, 0], [1, 2, 3, 4]], axis=1)
    es1 = build_edge_set(t1, 6, 3, tile_size=4, with_dst_layout=True)
    m1 = _merged_from_es(es1, row_block=4, chunk=8)
    assert m1.num_pairs == es1.num_edges


def test_merged_forward_matches_unmerged():
    rng = np.random.default_rng(1)
    n, r = 48, 4
    triples = _reciprocal_triples(rng, n, r, 220, reciprocity=0.85)
    es, x, bases, comps = _setup(triples, n, r)
    m = _merged_from_es(es)

    want = np.asarray(rel_spmm_basis_ad(es, x, bases, comps, compute_dtype=None))
    got = np.asarray(
        rel_spmm_basis_merged_ad(m, x, bases, comps, compute_dtype=None)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_merged_gradients_match_unmerged():
    rng = np.random.default_rng(3)
    n, r = 40, 4
    triples = _reciprocal_triples(rng, n, r, 200, reciprocity=0.9)
    es, x, bases, comps = _setup(triples, n, r)
    m = _merged_from_es(es)

    def loss_unmerged(x, bases, comps):
        return jnp.sum(
            jnp.sin(rel_spmm_basis_ad(es, x, bases, comps, compute_dtype=None))
        )

    def loss_merged(x, bases, comps):
        return jnp.sum(
            jnp.sin(
                rel_spmm_basis_merged_ad(m, x, bases, comps, compute_dtype=None)
            )
        )

    g1 = jax.grad(loss_merged, argnums=(0, 1, 2))(x, bases, comps)
    g2 = jax.grad(loss_unmerged, argnums=(0, 1, 2))(x, bases, comps)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        )


def test_edgeset_merged_dispatch():
    """rel_spmm_basis_ad prefers edges.merged when attached, including
    under jit with the EdgeSet passed as an argument (pytree round-trip)."""
    import dataclasses

    rng = np.random.default_rng(4)
    n, r = 44, 4
    triples = _reciprocal_triples(rng, n, r, 180, reciprocity=0.8)
    es, x, bases, comps = _setup(triples, n, r)
    es_m = dataclasses.replace(es, merged=_merged_from_es(es))

    want = np.asarray(rel_spmm_basis_ad(es, x, bases, comps, compute_dtype=None))

    @jax.jit
    def run(es_arg, x, bases, comps):
        return rel_spmm_basis_ad(es_arg, x, bases, comps, compute_dtype=None)

    got = np.asarray(run(es_m, x, bases, comps))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_diag_merged_matches_unmerged():
    """Coalesced diag path (e-RGCN): vector per-slot weights — outputs and
    both gradients must match the unmerged permute-free kernel."""
    from rgcn_tpu.ops.pallas_diag import rel_spmm_diag_ad

    rng = np.random.default_rng(6)
    n, r, d = 40, 4, 12
    triples = _reciprocal_triples(rng, n, r, 200, reciprocity=0.9)
    es = build_edge_set(triples, n, r, tile_size=16, with_dst_layout=True)
    import dataclasses

    es_m = dataclasses.replace(es, merged=_merged_from_es(es))
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    dw = jnp.asarray(rng.normal(size=(2 * r, d)).astype(np.float32))

    want = np.asarray(rel_spmm_diag_ad(es, x, dw))
    got = np.asarray(rel_spmm_diag_ad(es_m, x, dw))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)

    def loss(es_arg, x, dw):
        return jnp.sum(jnp.sin(rel_spmm_diag_ad(es_arg, x, dw)))

    g1 = jax.grad(loss, argnums=(1, 2))(es_m, x, dw)
    g2 = jax.grad(loss, argnums=(1, 2))(es, x, dw)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        )


def test_embedding_nc_merged_matches_unmerged():
    """EmbeddingNodeClassifier (e-RGCN) end-to-end: logits and parameter
    gradients identical (to f32 reassociation) with a merged EdgeSet."""
    import dataclasses

    from rgcn_tpu.models import EmbeddingNodeClassifier

    rng = np.random.default_rng(7)
    n, r = 40, 4
    triples = _reciprocal_triples(rng, n, r, 180, reciprocity=0.8)
    es = build_edge_set(triples, n, r, tile_size=16, with_dst_layout=True)
    es_m = dataclasses.replace(es, merged=_merged_from_es(es))

    model = EmbeddingNodeClassifier(
        num_nodes=n, num_relations=r, num_classes=3, emb_dim=8,
        backend="pallas",
    )
    params = model.init(jax.random.key(0), es)

    want = np.asarray(model.apply(params, es))
    got = np.asarray(model.apply(params, es_m))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)

    def loss(es_arg, p):
        return jnp.sum(jnp.tanh(model.apply(p, es_arg)))

    g1 = jax.grad(lambda p: loss(es_m, p))(params)
    g2 = jax.grad(lambda p: loss(es, p))(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        )


def test_merged_refuses_large_relation_vocab():
    import pytest

    rng = np.random.default_rng(5)
    n, r = 30, 4
    triples = make_random_triples(rng, n, r, 100)
    es = build_edge_set(triples, n, r, tile_size=16, with_dst_layout=True)
    with pytest.raises(ValueError):
        build_merged_layout(
            es.dst, es.src, es.rel, es.val, es.num_nodes, es.num_rels,
            max_rels=4,
        )


def test_dedup_forward_and_grads_match_unmerged():
    """The K-lane source-dedup'd forward frame (dedup_k) is an exact
    reassociation: forward and ALL gradients match the unmerged kernel at
    f32, the gather slot count strictly shrinks on a reciprocal graph, and
    every pair contributes exactly once (coefficient mass preserved)."""
    rng = np.random.default_rng(11)
    n, r = 60, 4
    triples = _reciprocal_triples(rng, n, r, 300, reciprocity=0.9)
    es, x, bases, comps = _setup(triples, n, r)

    def loss_u(x, bases, comps):
        return jnp.sum(
            jnp.sin(rel_spmm_basis_ad(es, x, bases, comps,
                                      compute_dtype=None))
        )

    ref = rel_spmm_basis_ad(es, x, bases, comps, compute_dtype=None)
    gu = jax.grad(loss_u, argnums=(0, 1, 2))(x, bases, comps)

    plain = build_merged_layout(
        es.dst, es.src, es.rel, es.val, es.num_nodes, es.num_rels,
        row_block=8, chunk=16,
    )
    for k in (2, 4):
        m = build_merged_layout(
            es.dst, es.src, es.rel, es.val, es.num_nodes, es.num_rels,
            row_block=8, chunk=16, dedup_k=k,
        )
        dd = m.fwd_dedup
        assert dd is not None and dd.num_k == k
        # fewer gather slots than the non-dedup'd merged frame
        assert dd.src_sorted.shape[0] < plain.layout.perm.shape[0]
        # every pair contributes once: coefficient mass preserved per lane sum
        np.testing.assert_allclose(
            dd.coeff_k.sum(), m.coeff.sum(), rtol=1e-6
        )

        got = rel_spmm_basis_merged_ad(m, x, bases, comps, compute_dtype=None)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

        def loss_m(x, bases, comps):
            return jnp.sum(
                jnp.sin(rel_spmm_basis_merged_ad(m, x, bases, comps,
                                                 compute_dtype=None))
            )

        gm = jax.grad(loss_m, argnums=(0, 1, 2))(x, bases, comps)
        for a, b in zip(gm, gu):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5
            )


def test_dedup_noop_without_duplicates():
    """On a graph with no within-block source duplicates the dedup frame
    degenerates to one lane used; results still exact."""
    t1 = np.stack([[0, 1, 2, 3], [0, 1, 2, 0], [1, 2, 3, 4]], axis=1)
    es, x, bases, comps = _setup(t1, 6, 3)
    m = build_merged_layout(
        es.dst, es.src, es.rel, es.val, es.num_nodes, es.num_rels,
        row_block=4, chunk=8, dedup_k=2,
    )
    ref = rel_spmm_basis_ad(es, x, bases, comps, compute_dtype=None)
    got = rel_spmm_basis_merged_ad(m, x, bases, comps, compute_dtype=None)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
    )
