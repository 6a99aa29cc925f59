"""Serving layer (rgcn_tpu/serve.py): encode-once query answering must
agree with the training-path forward, across bucket padding, ranking
directions, and the checkpoint round trip."""

import jax
import jax.numpy as jnp
import numpy as np

from rgcn_tpu.graph.structure import build_edge_set
from rgcn_tpu.models import LinkPredictor, NodeClassifier
from rgcn_tpu.serve import (
    LinkPredictionServer,
    NodeClassificationServer,
    load_lp_server,
)
from tests.conftest import make_random_triples


def _lp_setup(rng, n=50, r=4, e=220):
    triples = make_random_triples(rng, n, r, e)
    edges = build_edge_set(triples, n, r, tile_size=16, with_dst_layout=True)
    model = LinkPredictor(
        num_nodes=n, num_relations=r, emb_dim=12, hidden1_size=12,
        num_layers=1, weight_init="schlichtkrull-normal", bias_init="zeros",
        decoder_l2_type="schlichtkrull-l2", decoder_l2=0.01,
    )
    batch = jnp.asarray(triples[:32])
    params = model.init({"params": jax.random.key(0)}, edges, batch)
    return model, params, edges, triples


def test_lp_server_scores_match_model_forward():
    rng = np.random.default_rng(0)
    model, params, edges, triples = _lp_setup(rng)
    srv = LinkPredictionServer(model, params, edges, max_batch=16)

    batch = triples[:23]  # not a power of two: exercises padding
    want, _pen = model.apply(params, edges, jnp.asarray(batch))
    got = srv.score(batch)
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-5, atol=1e-5)


def test_lp_server_topk_matches_bruteforce():
    rng = np.random.default_rng(1)
    model, params, edges, triples = _lp_setup(rng)
    srv = LinkPredictionServer(model, params, edges, max_batch=8)
    z = np.asarray(srv.z)
    rel = np.asarray(params["params"]["scoring_function"]["relations"])

    sp = np.stack([triples[:5, 0], triples[:5, 1]], axis=1)
    scores, ents = srv.topk_tails(sp, k=4)
    for i, (s, p) in enumerate(sp):
        full = (z[s] * rel[p]) @ z.T
        order = np.argsort(-full)
        np.testing.assert_allclose(
            scores[i], np.sort(full)[::-1][:4], rtol=1e-5, atol=1e-5
        )
        assert set(ents[i]) == set(order[:4])

    po = np.stack([triples[:5, 1], triples[:5, 2]], axis=1)
    scores_h, ents_h = srv.topk_heads(po, k=4)
    for i, (p, o) in enumerate(po):
        full = z @ (rel[p] * z[o])
        np.testing.assert_allclose(
            scores_h[i], np.sort(full)[::-1][:4], rtol=1e-5, atol=1e-5
        )


def test_lp_server_filtered_topk_excludes_known_true():
    """KG-completion mode: candidates registered as known-true must drop
    out of top-k (reference filter semantics, utils/misc.py:39-58), while
    the raw ranking still returns them."""
    rng = np.random.default_rng(7)
    model, params, edges, triples = _lp_setup(rng)
    srv = LinkPredictionServer(model, params, edges, max_batch=8)

    sp = np.stack([triples[:6, 0], triples[:6, 1]], axis=1)
    raw_scores, raw_ents = srv.topk_tails(sp, k=5)

    # Register each query's raw top-1 (and for some queries more, to
    # exercise ragged filter rows) as known true.
    known = []
    banned_by_sp = {}  # queries may share an (s, p) key: filters merge
    for i, (s, p) in enumerate(sp):
        depth = 1 + (i % 3)  # rows of length 1..3 — ragged widths
        for e in raw_ents[i, :depth]:
            known.append((int(s), int(p), int(e)))
            banned_by_sp.setdefault((int(s), int(p)), set()).add(int(e))
    srv.set_filters(np.asarray(known))

    filt_scores, filt_ents = srv.topk_tails(sp, k=5, filtered=True)
    for i, (s, p) in enumerate(sp):
        banned = banned_by_sp[(int(s), int(p))]
        assert banned & set(int(e) for e in raw_ents[i]), "raw keeps them"
        assert not banned & set(int(e) for e in filt_ents[i])
        # surviving order is the raw order with banned entries removed
        want = [int(e) for e in raw_ents[i] if int(e) not in banned]
        assert [int(e) for e in filt_ents[i][: len(want)]] == want
        assert np.all(np.isfinite(filt_scores[i]))

    # head direction: ban the raw top-1 head for (p, o) queries
    po = np.stack([triples[:4, 1], triples[:4, 2]], axis=1)
    _, raw_h = srv.topk_heads(po, k=3)
    srv.set_filters(
        np.asarray([
            (int(raw_h[i, 0]), int(p), int(o)) for i, (p, o) in enumerate(po)
        ])
    )
    _, filt_h = srv.topk_heads(po, k=3, filtered=True)
    for i in range(len(po)):
        assert int(raw_h[i, 0]) not in set(int(e) for e in filt_h[i])

    # a query with NO known triples must match the raw ranking exactly
    srv.set_filters(np.asarray([(0, 0, 0)]))
    novel = np.asarray([[int(triples[10, 0]), int(triples[10, 1])]])
    if not (int(novel[0, 0]) == 0 and int(novel[0, 1]) == 0):
        s_raw, e_raw = srv.topk_tails(novel, k=4)
        s_f, e_f = srv.topk_tails(novel, k=4, filtered=True)
        np.testing.assert_allclose(s_f, s_raw, rtol=1e-6, atol=1e-6)
        np.testing.assert_array_equal(e_f, e_raw)


def test_lp_server_filtered_requires_known_triples():
    rng = np.random.default_rng(8)
    model, params, edges, triples = _lp_setup(rng)
    srv = LinkPredictionServer(model, params, edges, max_batch=8)
    sp = np.stack([triples[:2, 0], triples[:2, 1]], axis=1)
    import pytest

    with pytest.raises(ValueError, match="known triples"):
        srv.topk_tails(sp, k=3, filtered=True)


def test_lp_server_bucketing_invariance():
    """Results must not depend on how queries land in padding buckets."""
    rng = np.random.default_rng(2)
    model, params, edges, triples = _lp_setup(rng)
    srv_small = LinkPredictionServer(model, params, edges, max_batch=4)
    srv_big = LinkPredictionServer(model, params, edges, max_batch=64)

    batch = triples[:13]
    np.testing.assert_allclose(
        srv_small.score(batch), srv_big.score(batch), rtol=1e-6, atol=1e-6
    )
    sp = np.stack([triples[:13, 0], triples[:13, 1]], axis=1)
    s1, e1 = srv_small.topk_tails(sp, k=3)
    s2, e2 = srv_big.topk_tails(sp, k=3)
    np.testing.assert_allclose(s1, s2, rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(e1, e2)


def test_lp_server_crgcn():
    """The compression (c-RGCN) encoder serves through the same endpoint —
    its residual encode must be what the server snapshots."""
    from rgcn_tpu.models import CompressionRelationPredictor

    rng = np.random.default_rng(9)
    n, r = 40, 4
    triples = make_random_triples(rng, n, r, 160)
    edges = build_edge_set(triples, n, r, tile_size=16, with_dst_layout=True)
    model = CompressionRelationPredictor(
        num_nodes=n, num_relations=r, emb_dim=16, hidden1_size=8,
        num_layers=1, weight_init="schlichtkrull-normal", bias_init="zeros",
    )
    batch = jnp.asarray(triples[:16])
    params = model.init({"params": jax.random.key(0)}, edges, batch)
    srv = LinkPredictionServer(model, params, edges, max_batch=8)

    want, _pen = model.apply(params, edges, batch)
    got = srv.score(np.asarray(batch))
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-5, atol=1e-5)
    z_direct = model.apply(params, edges, method=model.encode)
    np.testing.assert_allclose(
        np.asarray(srv.z), np.asarray(z_direct), rtol=1e-6, atol=1e-6
    )


def test_nc_server_matches_forward():
    rng = np.random.default_rng(3)
    n, r = 40, 4
    triples = make_random_triples(rng, n, r, 150)
    edges = build_edge_set(triples, n, r, tile_size=16, with_dst_layout=True)
    model = NodeClassifier(
        num_nodes=n, num_relations=r, num_classes=3, hidden_size=8
    )
    params = model.init(jax.random.key(0), edges)
    srv = NodeClassificationServer(model, params, edges)

    want = np.argmax(np.asarray(model.apply(params, edges)), axis=-1)
    got = srv.classify(np.arange(n))
    np.testing.assert_array_equal(got, want)
    probs = srv.probabilities([0, 5, 7])
    np.testing.assert_allclose(probs.sum(axis=-1), 1.0, rtol=1e-6)


def test_load_nc_server_checkpoint_roundtrip(tmp_path):
    """NC training checkpoints (incl. multi-repeat subdirs) serve
    identically to in-memory params."""
    from rgcn_tpu.config import load_experiment
    from rgcn_tpu.data.synthetic import synthetic_node_classification
    from rgcn_tpu.serve import load_nc_server
    from rgcn_tpu.train.node_classification import build_nc_model
    from rgcn_tpu.utils.checkpoint import save_checkpoint

    cfg = load_experiment("configs/e-rgcn/nc-AIFB.yaml")
    data = synthetic_node_classification(
        num_nodes=50, num_rels=6, num_edges=250, seed=5
    )
    edges = build_edge_set(
        data.triples, data.num_nodes, data.num_relations, tile_size=16,
        with_dst_layout=True,
    )
    model = build_nc_model(cfg, data)
    params = model.init(jax.random.key(0), edges)
    # multi-repeat layout: checkpoint lives under repeat_1/
    save_checkpoint(str(tmp_path / "repeat_1"), {"params": params}, step=3)

    srv = load_nc_server(cfg, data, str(tmp_path), tile_size=16)
    assert srv is not None
    want = np.argmax(np.asarray(model.apply(params, edges)), axis=-1)
    got = srv.classify(np.arange(data.num_nodes))
    np.testing.assert_array_equal(got, want)

    assert load_nc_server(cfg, data, str(tmp_path / "missing")) is None


def test_load_lp_server_checkpoint_roundtrip(tmp_path):
    """Checkpointed training params serve identically to in-memory ones."""
    from rgcn_tpu.config import load_experiment
    from rgcn_tpu.data.synthetic import synthetic_link_prediction
    from rgcn_tpu.utils.checkpoint import save_checkpoint

    cfg = load_experiment("configs/rgcn/lp-WN18.yaml")
    data = synthetic_link_prediction(
        num_nodes=60, num_rels=6, num_edges=300, reciprocity=0.5, seed=4
    )
    n, r = data.num_nodes, data.num_relations
    train_np = np.asarray(data.train, dtype=np.int64)

    from rgcn_tpu.graph.dynamic import build_edge_set_dynamic
    from rgcn_tpu.train.link_prediction import build_lp_model

    model = build_lp_model(cfg, n, r)
    init_pos = jnp.asarray(train_np[:64])
    params = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        build_edge_set_dynamic(init_pos, n, r, tile_size=16),
        init_pos,
    )
    # a REAL training checkpoint also carries opt_state — serving must
    # partial-restore just the params out of it
    import optax

    opt_state = optax.adam(1e-2).init(params)
    save_checkpoint(
        str(tmp_path), {"params": params, "opt_state": opt_state}, step=7
    )

    srv = load_lp_server(cfg, data, str(tmp_path), tile_size=16)
    assert srv is not None

    edges = build_edge_set(train_np, n, r, tile_size=16, with_dst_layout=True)
    direct = LinkPredictionServer(model, params, edges)
    batch = train_np[:10]
    np.testing.assert_allclose(
        srv.score(batch), direct.score(batch), rtol=1e-5, atol=1e-5
    )

    # absent checkpoint -> None
    assert load_lp_server(cfg, data, str(tmp_path / "nope")) is None


def test_lp_server_pinned_executables_roundtrip(tmp_path):
    """A server built with exe_cache_dir persists its compiled programs;
    a second server (simulating a process restart) loads them from the
    cache and answers identically to an uncached server."""
    import pytest

    rng = np.random.default_rng(9)
    model, params, edges, triples = _lp_setup(rng)
    plain = LinkPredictionServer(model, params, edges, max_batch=8)

    cache = str(tmp_path / "exe")
    srv1 = LinkPredictionServer(
        model, params, edges, max_batch=8, exe_cache_dir=cache
    )
    sp = np.stack([triples[:5, 0], triples[:5, 1]], axis=1)
    s1, e1 = srv1.topk_tails(sp, k=4)
    sc1 = srv1.score(triples[:7])

    import os

    entries = [f for f in os.listdir(cache) if f.startswith("exe_")]
    if not entries:
        pytest.skip("backend does not support executable serialization")

    # fresh server, same cache dir: encode/score/rank all load pinned
    srv2 = LinkPredictionServer(
        model, params, edges, max_batch=8, exe_cache_dir=cache
    )
    s2, e2 = srv2.topk_tails(sp, k=4)
    sc2 = srv2.score(triples[:7])
    sp_, ep_ = plain.topk_tails(sp, k=4)
    scp = plain.score(triples[:7])

    np.testing.assert_array_equal(np.asarray(srv1.z), np.asarray(srv2.z))
    np.testing.assert_array_equal(s1, s2)
    np.testing.assert_array_equal(e1, e2)
    np.testing.assert_array_equal(sc1, sc2)
    # and the pinned servers agree with the uncached one
    np.testing.assert_allclose(s1, sp_, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(sc1, scp, rtol=1e-6, atol=1e-6)
