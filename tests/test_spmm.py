"""Numerical tests of the relational SpMM variants against a NumPy oracle.

Oracle semantics (the unified form of the reference's four codepaths,
``/root/reference/torch_rgcn/layers.py:286-301``):

    out[s] = sum over augmented edges (s, p, o) of X[o] @ W[p] / deg_p(s)

where ``deg_p(s)`` counts augmented edges with subject ``s``, relation ``p``.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rgcn_tpu.graph.augment import inverse_triples
from rgcn_tpu.graph.structure import build_edge_set
from rgcn_tpu.ops import spmm
from tests.conftest import make_random_triples


def oracle_spmm(triples, num_nodes, num_rels, x, weights):
    """Direct per-edge accumulation over originals + inverses (no self)."""
    aug = np.concatenate([triples, inverse_triples(triples, num_rels)], axis=0)
    from collections import Counter

    deg = Counter((int(p), int(s)) for s, p, _ in aug)
    out = np.zeros((num_nodes, weights.shape[-1]), dtype=np.float64)
    for s, p, o in aug:
        out[s] += x[o] @ weights[p] / deg[(int(p), int(s))]
    return out


@pytest.mark.parametrize("tile_size", [8, 64])
def test_rel_spmm_matches_oracle(tile_size):
    rng = np.random.default_rng(3)
    n, r, din, dout = 25, 4, 6, 5
    triples = make_random_triples(rng, n, r, 80)
    x = rng.normal(size=(n, din)).astype(np.float32)
    w = rng.normal(size=(2 * r, din, dout)).astype(np.float32)

    es = build_edge_set(triples, n, r, tile_size=tile_size)
    got = np.asarray(spmm.rel_spmm(es, jnp.asarray(x), jnp.asarray(w)))
    want = oracle_spmm(triples, n, r, x, w)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_rel_spmm_featureless_matches_dense():
    """Featureless == rel_spmm with identity features."""
    rng = np.random.default_rng(4)
    n, r, dout = 15, 3, 4
    triples = make_random_triples(rng, n, r, 40)
    w = rng.normal(size=(2 * r, n, dout)).astype(np.float32)

    es = build_edge_set(triples, n, r, tile_size=8)
    got = np.asarray(spmm.rel_spmm_featureless(es, jnp.asarray(w)))
    eye = np.eye(n, dtype=np.float32)
    want = np.asarray(spmm.rel_spmm(es, jnp.asarray(eye), jnp.asarray(w)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_rel_spmm_diag_matches_dense():
    """Diagonal weights == dense weights with diagonal matrices."""
    rng = np.random.default_rng(5)
    n, r, d = 12, 3, 5
    triples = make_random_triples(rng, n, r, 30)
    wd = rng.normal(size=(2 * r, d)).astype(np.float32)
    x = rng.normal(size=(n, d)).astype(np.float32)

    es = build_edge_set(triples, n, r, tile_size=8)
    got = np.asarray(spmm.rel_spmm_diag(es, jnp.asarray(x), jnp.asarray(wd)))
    w_full = np.stack([np.diag(v) for v in wd])
    want = np.asarray(spmm.rel_spmm(es, jnp.asarray(x), jnp.asarray(w_full)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_rel_spmm_block_matches_dense():
    """Blockwise message computation == expanded block-diagonal weights."""
    rng = np.random.default_rng(6)
    n, r = 14, 2
    nb, ib, ob = 3, 2, 2
    din, dout = nb * ib, nb * ob
    triples = make_random_triples(rng, n, r, 35)
    blocks = rng.normal(size=(2 * r, nb, ib, ob)).astype(np.float32)
    x = rng.normal(size=(n, din)).astype(np.float32)

    es = build_edge_set(triples, n, r, tile_size=8)
    got = np.asarray(spmm.rel_spmm_block(es, jnp.asarray(x), jnp.asarray(blocks)))

    w_full = np.zeros((2 * r, din, dout), dtype=np.float32)
    for rr in range(2 * r):
        for b in range(nb):
            w_full[rr, b * ib : (b + 1) * ib, b * ob : (b + 1) * ob] = blocks[rr, b]
    want = np.asarray(spmm.rel_spmm(es, jnp.asarray(x), jnp.asarray(w_full)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_rel_spmm_grad_flows():
    """Gradients flow through gather + matmul + scatter."""
    import jax

    rng = np.random.default_rng(7)
    n, r, din, dout = 10, 2, 4, 3
    triples = make_random_triples(rng, n, r, 20)
    es = build_edge_set(triples, n, r, tile_size=8)
    x = jnp.asarray(rng.normal(size=(n, din)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(2 * r, din, dout)).astype(np.float32))

    def loss(w, x):
        return jnp.sum(spmm.rel_spmm(es, x, w) ** 2)

    gw, gx = jax.grad(loss, argnums=(0, 1))(w, x)
    assert np.isfinite(np.asarray(gw)).all()
    assert np.isfinite(np.asarray(gx)).all()
    assert float(jnp.abs(gw).sum()) > 0
    assert float(jnp.abs(gx).sum()) > 0


def test_featureless_basis_no_expansion_matches():
    """Per-tile basis contraction == expanded-weights featureless path."""
    rng = np.random.default_rng(8)
    n, r, nb, dout = 20, 4, 3, 5
    triples = make_random_triples(rng, n, r, 50)
    bases = rng.normal(size=(nb, n, dout)).astype(np.float32)
    comps = rng.normal(size=(2 * r, nb)).astype(np.float32)

    es = build_edge_set(triples, n, r, tile_size=8)
    got = np.asarray(
        spmm.rel_spmm_featureless_basis(
            es, jnp.asarray(bases), jnp.asarray(comps)
        )
    )
    w_full = np.einsum("rb,bio->rio", comps, bases)
    want = np.asarray(spmm.rel_spmm_featureless(es, jnp.asarray(w_full)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("grouped", [False, True])
def test_featureless_basis_pair_index_exact(grouped, monkeypatch):
    """Unique-(src, rel) pair pre-contraction == direct per-edge path:
    forward AND gradients w.r.t. bases/comps (f32 allclose), including the
    checkpoint tile-group regime (tiny element budget)."""
    import jax

    from rgcn_tpu.graph.structure import build_src_rel_pairs

    rng = np.random.default_rng(9)
    n, r, nb, dout = 30, 4, 5, 6
    # duplicate many (src, rel) pairs so the dedup is actually exercised
    triples = make_random_triples(rng, 12, r, 90, unique=True)
    bases = jnp.asarray(rng.normal(size=(nb, n, dout)).astype(np.float32))
    comps = jnp.asarray(rng.normal(size=(2 * r, nb)).astype(np.float32))

    if grouped:
        monkeypatch.setattr(spmm, "_ELEM_BUDGET", 64)
        monkeypatch.setattr(spmm, "_PAIR_ELEM_BUDGET", 64)
    es = build_edge_set(triples, n, r, tile_size=8)
    es_p = build_edge_set(triples, n, r, tile_size=8, with_pair_index=True)
    assert es_p.pairs is not None
    assert es_p.pairs.num_pairs < es_p.num_edges  # dedup happened

    def f(es_):
        def loss(b, c):
            out = spmm.rel_spmm_featureless_basis(es_, b, c)
            return jnp.sum(out * out), out

        (val, out), grads = jax.value_and_grad(
            loss, argnums=(0, 1), has_aux=True
        )(bases, comps)
        return val, out, grads

    v0, out0, (gb0, gc0) = f(es)
    v1, out1, (gb1, gc1) = f(es_p)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out0),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gb1), np.asarray(gb0),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gc1), np.asarray(gc0),
                               rtol=1e-4, atol=1e-5)


def test_pair_index_exact_under_reweighting():
    """The pair index freezes only (src, rel); replacing `val` (dropout
    masking) must stay exact — unlike `merged`, which snapshots weights."""
    import dataclasses as _dc

    rng = np.random.default_rng(10)
    n, r, nb, dout = 20, 3, 4, 5
    triples = make_random_triples(rng, 10, r, 60, unique=True)
    bases = jnp.asarray(rng.normal(size=(nb, n, dout)).astype(np.float32))
    comps = jnp.asarray(rng.normal(size=(2 * r, nb)).astype(np.float32))

    es_p = build_edge_set(triples, n, r, tile_size=8, with_pair_index=True)
    mask = (rng.random(es_p.val.shape[0]) < 0.6).astype(np.float32)
    new_val = jnp.asarray(np.asarray(es_p.val) * mask)
    es_masked = _dc.replace(es_p, val=new_val)
    es_plain = _dc.replace(es_p, val=new_val, pairs=None)

    got = np.asarray(
        spmm.rel_spmm_featureless_basis(es_masked, bases, comps)
    )
    want = np.asarray(
        spmm.rel_spmm_featureless_basis(es_plain, bases, comps)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("grouped", [False, True])
def test_featureful_basis_pairs_exact(grouped, monkeypatch):
    """H-precompute pair path == expanded-weights dense path (featureful
    basis): forward and gradients w.r.t. x/bases/comps."""
    import jax

    rng = np.random.default_rng(11)
    n, r, nb, din, dout = 25, 4, 5, 6, 7
    triples = make_random_triples(rng, 12, r, 80, unique=True)
    x = jnp.asarray(rng.normal(size=(n, din)).astype(np.float32))
    bases = jnp.asarray(rng.normal(size=(nb, din, dout)).astype(np.float32))
    comps = jnp.asarray(rng.normal(size=(2 * r, nb)).astype(np.float32))

    if grouped:
        monkeypatch.setattr(spmm, "_PAIR_ELEM_BUDGET", 64)
    es = build_edge_set(triples, n, r, tile_size=8, with_pair_index=True)

    def loss_pairs(x_, b, c):
        out = spmm.rel_spmm_basis_pairs(es, x_, b, c)
        return jnp.sum(out * out), out

    def loss_dense(x_, b, c):
        w = jnp.einsum("rb,bio->rio", c, b)
        out = spmm.rel_spmm(es, x_, w)
        return jnp.sum(out * out), out

    (v1, out1), g1 = jax.value_and_grad(
        loss_pairs, argnums=(0, 1, 2), has_aux=True
    )(x, bases, comps)
    (v0, out0), g0 = jax.value_and_grad(
        loss_dense, argnums=(0, 1, 2), has_aux=True
    )(x, bases, comps)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out0),
                               rtol=1e-4, atol=1e-5)
    for a, b in zip(g1, g0):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_node_classifier_pairs_matches_no_pairs():
    """NodeClassifier logits with the pair index == without (both layers
    route through pair paths when present; nb > 8 forces the non-kernel
    branches)."""
    import dataclasses as _dc

    import jax

    from rgcn_tpu.models import NodeClassifier

    rng = np.random.default_rng(12)
    n, r, c = 30, 4, 3
    triples = make_random_triples(rng, 15, r, 90, unique=True)
    es_p = build_edge_set(triples, n, r, tile_size=8, with_pair_index=True)
    es = _dc.replace(es_p, pairs=None)

    model = NodeClassifier(
        num_nodes=n, num_relations=r, num_classes=c, hidden_size=8,
        decomposition="basis", num_bases=10,
    )
    params = model.init(jax.random.key(0), es)
    out_plain = np.asarray(model.apply(params, es))
    out_pairs = np.asarray(model.apply(params, es_p))
    np.testing.assert_allclose(out_pairs, out_plain, rtol=1e-4, atol=1e-5)
