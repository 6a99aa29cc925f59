"""Multi-chip correctness on a virtual 8-device CPU mesh.

The sharded training steps must be numerically equivalent to the
single-device computation: same loss, same updated parameters. This is the
core guarantee behind the edge-partitioned scaling story — sharding is an
execution detail, never a semantics change.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from rgcn_tpu.config import load_experiment
from rgcn_tpu.dist.mesh import EDGE_AXIS, make_mesh, shard_edge_set
from rgcn_tpu.dist.train import make_sharded_lp_step, make_sharded_nc_step
from rgcn_tpu.graph.dynamic import build_edge_set_dynamic
from rgcn_tpu.graph.structure import build_edge_set
from rgcn_tpu.models import LinkPredictor, NodeClassifier
from rgcn_tpu.train.negative import corrupt_batch
from rgcn_tpu.train.optim import make_optimizer
from tests.conftest import make_random_triples

N_DEV = 8


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < N_DEV:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(N_DEV)


def tree_allclose(a, b, rtol=1e-4, atol=1e-5):
    flat_a = jax.tree.leaves(a)
    flat_b = jax.tree.leaves(b)
    assert len(flat_a) == len(flat_b)
    for xa, xb in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(xa), np.asarray(xb), rtol=rtol, atol=atol
        )


def test_sharded_nc_step_matches_single_device(mesh):
    rng = np.random.default_rng(20)
    n, r, c = 40, 5, 3
    triples = make_random_triples(rng, n, r, 150)
    train_idx = jnp.asarray(rng.choice(n, 12, replace=False))
    train_lbl = jnp.asarray(rng.integers(0, c, 12))

    kwargs = dict(
        num_nodes=n, num_relations=r, num_classes=c, hidden_size=8,
        decomposition="basis", num_bases=3,
    )
    model_s = NodeClassifier(axis_name=EDGE_AXIS, **kwargs)
    model_1 = NodeClassifier(**kwargs)

    es_1 = build_edge_set(triples, n, r, tile_size=8)
    es_s = build_edge_set(triples, n, r, tile_size=8, tile_multiple=N_DEV)
    es_s = shard_edge_set(es_s, mesh)

    params = model_1.init(jax.random.key(0), es_1)
    # SGD: the parity guarantee is loss/gradient-level; adam's sign
    # normalization amplifies float-associativity noise (different tile
    # paddings reduce in different orders) into O(lr) parameter jumps.
    tx = make_optimizer("sgd", 0.01)
    opt_state = tx.init(params)

    # single-device step
    def loss_1(p):
        logits = model_1.apply(p, es_1)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits[train_idx], train_lbl
        ).mean() + 0.01 * model_1.layer1_l2(p)

    loss_ref, grads_ref = jax.value_and_grad(loss_1)(params)
    upd, opt1 = tx.update(grads_ref, opt_state, params)
    params_ref = optax.apply_updates(params, upd)

    step = make_sharded_nc_step(
        model_s, tx, mesh, train_idx, train_lbl, layer1_l2=0.01
    )
    params_s, _, loss_s = step(params, tx.init(params), es_s)

    np.testing.assert_allclose(float(loss_s), float(loss_ref), rtol=1e-5)
    tree_allclose(params_s, params_ref)


@pytest.mark.parametrize("bsz", [24, 21])  # 96 % 8 == 0; 84 % 8 != 0
def test_sharded_lp_step_matches_single_device(mesh, bsz):
    """Sharded step == single-device step, with and without scoring-batch
    padding: the nondivisible case checks that pad triples (0,0,0) are
    excluded from BOTH the BCE and the schlichtkrull-l2 penalty."""
    rng = np.random.default_rng(21)
    n, r = 48, 4
    triples = make_random_triples(rng, n, r, 200)
    num_neg, tile = 3, 8

    kwargs = dict(
        num_nodes=n, num_relations=r, emb_dim=8, hidden1_size=8,
        num_layers=1, decomposition="basis", num_bases=2,
        weight_init="schlichtkrull-normal", bias_init="zeros",
        decoder_l2_type="schlichtkrull-l2", decoder_l2=0.01,
    )
    model_s = LinkPredictor(axis_name=EDGE_AXIS, **kwargs)
    model_1 = LinkPredictor(**kwargs)

    positives = jnp.asarray(triples[:bsz])
    init_edges = build_edge_set_dynamic(positives, n, r, tile_size=tile)
    params = model_1.init(
        {"params": jax.random.key(1)}, init_edges, positives
    )
    tx = make_optimizer("adam", 0.01)

    key = jax.random.key(7)

    # single-device step (mirrors train.link_prediction.step, no dropout so
    # mask layouts can't differ between tile paddings)
    def single_step(params, opt_state, positives, key):
        k_neg, k_drop, k_self, k_sl = jax.random.split(key, 4)
        batch, labels = corrupt_batch(k_neg, positives, n, num_neg, 0.5)
        edges = build_edge_set_dynamic(positives, n, r, tile_size=tile)

        def loss_fn(p):
            scores, penalty = model_1.apply(
                p, edges, batch, deterministic=True
            )
            return (
                optax.sigmoid_binary_cross_entropy(scores, labels).mean()
                + 0.01 * penalty
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params_ref, _, loss_ref = single_step(params, tx.init(params), positives, key)

    step = make_sharded_lp_step(
        model_s, tx, mesh,
        num_nodes=n, num_rels=r, tile_size=tile,
        num_negatives=num_neg, head_prob=0.5,
        decoder_l2_weight=0.01,
    )
    params_s, _, loss_s = step(params, tx.init(params), positives, key)

    np.testing.assert_allclose(float(loss_s), float(loss_ref), rtol=1e-4)
    tree_allclose(params_s, params_ref, rtol=2e-4, atol=2e-5)


def test_prepare_sharded_layouts_pallas_forward(mesh):
    """Per-shard Pallas layouts (interpret mode on CPU) under shard_map ==
    unsharded XLA forward."""
    import functools

    from jax.sharding import PartitionSpec as P

    from rgcn_tpu.dist.mesh import prepare_sharded_layouts
    from rgcn_tpu.nn.layers import RGCNConv

    rng = np.random.default_rng(22)
    n, r, d = 32, 3, 8
    triples = make_random_triples(rng, n, r, 120)
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))

    es_1 = build_edge_set(triples, n, r, tile_size=8)
    es_s = shard_edge_set(
        build_edge_set(triples, n, r, tile_size=8, tile_multiple=N_DEV), mesh
    )
    es_s = prepare_sharded_layouts(es_s, mesh, row_block=8)
    assert es_s.layout is not None and es_s.reverse is not None

    layer_1 = RGCNConv(
        num_nodes=n, num_relations=2 * r + 1, in_features=d, out_features=d,
        backend="xla",
    )
    layer_s = RGCNConv(
        num_nodes=n, num_relations=2 * r + 1, in_features=d, out_features=d,
        backend="pallas", axis_name=EDGE_AXIS,
    )
    params = layer_1.init(jax.random.key(0), es_1, x)
    want = np.asarray(layer_1.apply(params, es_1, x))

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(EDGE_AXIS), P()), out_specs=P(),
        check_vma=False,
    )
    def fwd(params, edges, x):
        return layer_s.apply(params, edges, x)

    got = np.asarray(fwd(params, es_s, x))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sharded_nc_step_pallas_matches_single_device(mesh):
    """Sharded NC training through the Pallas kernels (interpret mode on
    CPU) == single-device XLA step — the round-2 vma unlock: the custom-VJP
    kernels run inside the differentiated shard_map(check_vma=False) with
    the manual-AD collectives supplying exact gradients."""
    from rgcn_tpu.dist.mesh import prepare_sharded_layouts

    rng = np.random.default_rng(23)
    n, r, c = 40, 5, 3
    triples = make_random_triples(rng, n, r, 150)
    train_idx = jnp.asarray(rng.choice(n, 12, replace=False))
    train_lbl = jnp.asarray(rng.integers(0, c, 12))

    kwargs = dict(num_nodes=n, num_relations=r, num_classes=c, hidden_size=8)
    model_s = NodeClassifier(axis_name=EDGE_AXIS, backend="pallas", **kwargs)
    model_1 = NodeClassifier(**kwargs)

    es_1 = build_edge_set(triples, n, r, tile_size=8)
    es_s = build_edge_set(triples, n, r, tile_size=8, tile_multiple=N_DEV)
    es_s = prepare_sharded_layouts(shard_edge_set(es_s, mesh), mesh, row_block=8)

    params = model_1.init(jax.random.key(0), es_1)
    tx = make_optimizer("sgd", 0.01)

    def loss_1(p):
        logits = model_1.apply(p, es_1)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits[train_idx], train_lbl
        ).mean() + 0.01 * model_1.layer1_l2(p)

    loss_ref, grads_ref = jax.value_and_grad(loss_1)(params)
    upd, _ = tx.update(grads_ref, tx.init(params), params)
    params_ref = optax.apply_updates(params, upd)

    step = make_sharded_nc_step(
        model_s, tx, mesh, train_idx, train_lbl, layer1_l2=0.01
    )
    params_s, _, loss_s = step(params, tx.init(params), es_s)

    np.testing.assert_allclose(float(loss_s), float(loss_ref), rtol=1e-5)
    tree_allclose(params_s, params_ref)


def test_sharded_nc_step_pairs_matches_single_device(mesh):
    """Sharded NC training through the per-shard HOST-built pair index +
    composed pair aggregation (prepare_sharded_pairs_host — the many-basis
    AM-class path, 2.0× at AM scale) == the single-device pair-path step.
    Pair dedup is per shard and the composed d_m backward runs per shard;
    the layer psum (manual-AD all_reduce) recovers the full-graph sums."""
    from rgcn_tpu.dist.mesh import prepare_sharded_pairs_host

    rng = np.random.default_rng(31)
    n, r, c, nb = 48, 6, 3, 10  # nb > 8 engages the pair paths
    triples = make_random_triples(rng, n, r, 220)
    train_idx = jnp.asarray(rng.choice(n, 14, replace=False))
    train_lbl = jnp.asarray(rng.integers(0, c, 14))

    kwargs = dict(
        num_nodes=n, num_relations=r, num_classes=c, hidden_size=8,
        decomposition="basis", num_bases=nb,
    )
    model_s = NodeClassifier(axis_name=EDGE_AXIS, backend="pallas", **kwargs)
    model_1 = NodeClassifier(**kwargs)

    es_1 = build_edge_set(
        triples, n, r, tile_size=8, with_dst_layout=True,
        with_pair_index=True, with_pair_agg=True,
    )
    es_bare = build_edge_set(triples, n, r, tile_size=8,
                             tile_multiple=N_DEV)
    es_s = prepare_sharded_pairs_host(es_bare, mesh, row_block=8)
    # every shard really carries pair structure
    assert es_s.pairs is not None and es_s.pairs.agg is not None
    assert es_s.layout.perm.shape[0] % N_DEV == 0

    params = model_1.init(jax.random.key(0), es_1)
    tx = make_optimizer("sgd", 0.01)

    def loss_1(p):
        logits = model_1.apply(p, es_1)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits[train_idx], train_lbl
        ).mean() + 0.01 * model_1.layer1_l2(p)

    loss_ref, grads_ref = jax.value_and_grad(loss_1)(params)
    upd, _ = tx.update(grads_ref, tx.init(params), params)
    params_ref = optax.apply_updates(params, upd)

    step = make_sharded_nc_step(
        model_s, tx, mesh, train_idx, train_lbl, layer1_l2=0.01
    )
    params_s, _, loss_s = step(params, tx.init(params), es_s)

    np.testing.assert_allclose(float(loss_s), float(loss_ref), rtol=1e-5)
    tree_allclose(params_s, params_ref)


def test_sharded_pairs_host_imbalanced_and_empty_shards(mesh):
    """prepare_sharded_pairs_host's uniform static bounds hold when the
    graph is wildly imbalanced across tile slices — including shards
    whose slice is ALL padding (one giant relation hogs the tile axis).
    The sharded step must still equal the single-device computation."""
    from rgcn_tpu.dist.mesh import prepare_sharded_pairs_host

    rng = np.random.default_rng(37)
    n, r, c, nb = 40, 6, 3, 10
    # all edges in ONE relation: after relation-sorted tiling most tiles
    # belong to it, so several mesh slices hold only its segment and the
    # trailing slices only pad tiles
    src = rng.integers(0, n, 130)
    dst = rng.integers(0, n, 130)
    triples = np.stack([dst, np.zeros(130, np.int64), src], axis=1)
    train_idx = jnp.asarray(rng.choice(n, 10, replace=False))
    train_lbl = jnp.asarray(rng.integers(0, c, 10))

    kwargs = dict(
        num_nodes=n, num_relations=r, num_classes=c, hidden_size=8,
        decomposition="basis", num_bases=nb,
    )
    model_s = NodeClassifier(axis_name=EDGE_AXIS, backend="pallas", **kwargs)
    model_1 = NodeClassifier(**kwargs)

    es_1 = build_edge_set(
        triples, n, r, tile_size=8, with_dst_layout=True,
        with_pair_index=True, with_pair_agg=True,
    )
    es_bare = build_edge_set(triples, n, r, tile_size=8,
                             tile_multiple=N_DEV)
    es_s = prepare_sharded_pairs_host(es_bare, mesh, row_block=8)

    params = model_1.init(jax.random.key(0), es_1)
    tx = make_optimizer("sgd", 0.01)

    def loss_1(p):
        logits = model_1.apply(p, es_1)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits[train_idx], train_lbl
        ).mean()

    loss_ref, grads_ref = jax.value_and_grad(loss_1)(params)
    upd, _ = tx.update(grads_ref, tx.init(params), params)
    params_ref = optax.apply_updates(params, upd)

    step = make_sharded_nc_step(model_s, tx, mesh, train_idx, train_lbl)
    params_s, _, loss_s = step(params, tx.init(params), es_s)

    np.testing.assert_allclose(float(loss_s), float(loss_ref), rtol=1e-5)
    tree_allclose(params_s, params_ref)


def test_sharded_nc_driver_pairs_matches_single_device(mesh):
    """The sharded NC driver auto-selects the per-shard pair structures
    for many-basis configs (pair_ok gating mirrors the single-device
    trainer) and tracks the single-device trainer metric-level."""
    from rgcn_tpu.config import load_experiment as _load
    from rgcn_tpu.data.synthetic import synthetic_node_classification
    from rgcn_tpu.dist.driver import train_node_classifier_sharded
    from rgcn_tpu.train.node_classification import train_node_classifier
    from rgcn_tpu.utils.logging import ScalarLogger

    data = synthetic_node_classification(
        num_nodes=200, num_rels=6, num_edges=1200, num_classes=3,
        labeled_frac=0.6, signal=0.9, seed=11,
    )
    cfg = _load({
        "dataset": {"name": "synthetic"},
        "training": {"epochs": 50,
                     "optimiser": {"algorithm": "adam",
                                   "learn_rate": 0.01,
                                   "weight_decay": 0.0}},
        "rgcn": {"model": "rgcn", "num_layers": 2, "hidden_size": 8,
                 "decomposition": {"type": "basis", "num_bases": 10}},
        "evaluation": {"final_run": True},
    })
    quiet = ScalarLogger(verbose=False)
    acc_1 = train_node_classifier(cfg, data, seed=3, logger=quiet,
                                  tile_size=8)
    acc_s = train_node_classifier_sharded(
        cfg, data, mesh, seed=3, logger=quiet, tile_size=8,
        backend="pallas",
    )
    assert acc_1 >= 70.0 and acc_s >= 70.0, (acc_1, acc_s)
    assert abs(acc_1 - acc_s) <= 8.0, (acc_1, acc_s)


@pytest.mark.parametrize("decomp", [None, "basis"])
def test_sharded_lp_step_pallas_matches_single_device(mesh, decomp):
    """Sharded LP training with per-shard in-jit Pallas layouts == the
    single-device step (backend='pallas' end to end; the basis variant
    exercises the aggregation-first kernel inside the sharded step)."""
    rng = np.random.default_rng(24)
    n, r = 48, 4
    triples = make_random_triples(rng, n, r, 200)
    bsz, num_neg, tile = 24, 3, 8

    kwargs = dict(
        num_nodes=n, num_relations=r, emb_dim=8, hidden1_size=8,
        num_layers=1, weight_init="schlichtkrull-normal", bias_init="zeros",
        decoder_l2_type="schlichtkrull-l2", decoder_l2=0.01,
        decomposition=decomp, num_bases=2 if decomp else 0,
    )
    model_s = LinkPredictor(axis_name=EDGE_AXIS, backend="pallas", **kwargs)
    model_1 = LinkPredictor(**kwargs)

    positives = jnp.asarray(triples[:bsz])
    init_edges = build_edge_set_dynamic(positives, n, r, tile_size=tile)
    params = model_1.init({"params": jax.random.key(1)}, init_edges, positives)
    tx = make_optimizer("sgd", 0.01)
    key = jax.random.key(9)

    def single_step(params, opt_state, positives, key):
        k_neg, _, _, _ = jax.random.split(key, 4)
        batch, labels = corrupt_batch(k_neg, positives, n, num_neg, 0.5)
        edges = build_edge_set_dynamic(positives, n, r, tile_size=tile)

        def loss_fn(p):
            scores, penalty = model_1.apply(p, edges, batch, deterministic=True)
            return (
                optax.sigmoid_binary_cross_entropy(scores, labels).mean()
                + 0.01 * penalty
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params_ref, _, loss_ref = single_step(params, tx.init(params), positives, key)

    step = make_sharded_lp_step(
        model_s, tx, mesh,
        num_nodes=n, num_rels=r, tile_size=tile,
        num_negatives=num_neg, head_prob=0.5,
        decoder_l2_weight=0.01, backend="pallas", row_block=8,
    )
    params_s, _, loss_s = step(params, tx.init(params), positives, key)

    np.testing.assert_allclose(float(loss_s), float(loss_ref), rtol=1e-4)
    tree_allclose(params_s, params_ref, rtol=2e-4, atol=2e-5)


def test_sharded_lp_step_2d_mesh_matches_single_device():
    """2-D (replica x edge) mesh: EdgeSet sharded over the edge axis,
    scoring batch over all 8 devices, decoder/loss reductions over both
    axes — numerically exact vs the single-device step."""
    if len(jax.devices()) < N_DEV:
        pytest.skip("needs 8 virtual devices")
    from rgcn_tpu.dist.multihost import REPLICA_AXIS, make_mesh_2d

    mesh2 = make_mesh_2d(num_replicas=2, edge_size=4)
    assert mesh2.shape == {REPLICA_AXIS: 2, EDGE_AXIS: 4}

    rng = np.random.default_rng(25)
    n, r = 48, 4
    triples = make_random_triples(rng, n, r, 200)
    bsz, num_neg, tile = 24, 3, 8  # 96 scoring rows over 8 shards

    kwargs = dict(
        num_nodes=n, num_relations=r, emb_dim=8, hidden1_size=8,
        num_layers=1, decomposition="basis", num_bases=2,
        weight_init="schlichtkrull-normal", bias_init="zeros",
        decoder_l2_type="schlichtkrull-l2", decoder_l2=0.01,
    )
    model_s = LinkPredictor(
        axis_name=EDGE_AXIS,
        decoder_axis_name=(REPLICA_AXIS, EDGE_AXIS),
        **kwargs,
    )
    model_1 = LinkPredictor(**kwargs)

    positives = jnp.asarray(triples[:bsz])
    init_edges = build_edge_set_dynamic(positives, n, r, tile_size=tile)
    params = model_1.init({"params": jax.random.key(1)}, init_edges, positives)
    tx = make_optimizer("sgd", 0.01)
    key = jax.random.key(11)

    def single_step(params, opt_state, positives, key):
        k_neg, _, _, _ = jax.random.split(key, 4)
        batch, labels = corrupt_batch(k_neg, positives, n, num_neg, 0.5)
        edges = build_edge_set_dynamic(positives, n, r, tile_size=tile)

        def loss_fn(p):
            scores, penalty = model_1.apply(p, edges, batch, deterministic=True)
            return (
                optax.sigmoid_binary_cross_entropy(scores, labels).mean()
                + 0.01 * penalty
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params_ref, _, loss_ref = single_step(params, tx.init(params), positives, key)

    step = make_sharded_lp_step(
        model_s, tx, mesh2,
        num_nodes=n, num_rels=r, tile_size=tile,
        num_negatives=num_neg, head_prob=0.5,
        decoder_l2_weight=0.01,
    )
    params_s, _, loss_s = step(params, tx.init(params), positives, key)

    np.testing.assert_allclose(float(loss_s), float(loss_ref), rtol=1e-4)
    tree_allclose(params_s, params_ref, rtol=2e-4, atol=2e-5)


def test_sharded_evaluation_matches_single_device(mesh):
    """Candidate-sharded ranking sweep (dist/evaluate.py) == the
    single-device encode-once evaluation, including filters and the N % K
    != 0 padding path."""
    from rgcn_tpu.dist.evaluate import evaluate_link_predictor_sharded
    from rgcn_tpu.train.evaluate import build_filters
    from rgcn_tpu.train.link_prediction import evaluate_link_predictor

    rng = np.random.default_rng(26)
    n, r = 50, 4  # 50 % 8 != 0 -> exercises candidate padding
    triples = make_random_triples(rng, n, r, 240)
    train, test = triples[:200], triples[200:]

    model = LinkPredictor(
        num_nodes=n, num_relations=r, emb_dim=8, hidden1_size=8,
        num_layers=1, weight_init="schlichtkrull-normal", bias_init="zeros",
    )
    from rgcn_tpu.graph.structure import build_edge_set as _bes

    edges = _bes(train, n, r, tile_size=8)
    params = model.init(
        {"params": jax.random.key(3)}, edges, jnp.asarray(train[:4])
    )

    all_triples = {tuple(t) for t in triples}
    filters = build_filters(test, all_triples, n)

    mrr_1, hits_1, ranks_1 = evaluate_link_predictor(
        model, params, edges, test, filters, batch_size=16
    )
    mrr_s, hits_s, ranks_s = evaluate_link_predictor_sharded(
        model, params, edges, test, filters, mesh, batch_size=16
    )
    np.testing.assert_array_equal(ranks_s, ranks_1)
    assert mrr_s == mrr_1


def test_sharded_lp_step_hosted_matches_single_device(mesh):
    """The production multi-chip shape: host-built per-shard EdgeSets (with
    Pallas layouts) + host-drawn scoring batch through
    make_sharded_lp_step_hosted == the single-device step on the same
    host-built inputs."""
    from rgcn_tpu.dist.host import build_sharded_epoch_host
    from rgcn_tpu.dist.train import make_sharded_lp_step_hosted
    from rgcn_tpu.graph.dynamic import build_edge_set_dynamic_host
    from rgcn_tpu.train.negative import corrupt_batch_host

    rng = np.random.default_rng(27)
    n, r = 48, 4
    triples = make_random_triples(rng, n, r, 200)
    bsz, num_neg, tile = 24, 3, 8

    kwargs = dict(
        num_nodes=n, num_relations=r, emb_dim=8, hidden1_size=8,
        num_layers=1, decomposition="basis", num_bases=2,
        weight_init="schlichtkrull-normal", bias_init="zeros",
        decoder_l2_type="schlichtkrull-l2", decoder_l2=0.01,
    )
    model_s = LinkPredictor(axis_name=EDGE_AXIS, backend="pallas", **kwargs)
    model_1 = LinkPredictor(backend="pallas", **kwargs)

    positives = triples[:bsz]
    keep = (rng.random(bsz) < 0.7).astype(np.float32)
    batch, labels = corrupt_batch_host(
        np.random.default_rng(3), positives, n, num_neg, 0.5
    )

    # single-device reference on the SAME host-built graph + batch
    es_1 = build_edge_set_dynamic_host(
        positives, n, r, tile_size=tile, dropout_rate=0.5, keep_mask=keep,
        with_dst_layout=True, row_block=8, layout_chunk=tile,
    )
    params = model_1.init(
        {"params": jax.random.key(5)}, es_1, jnp.asarray(batch)
    )
    tx = make_optimizer("sgd", 0.01)

    def loss_1(p):
        scores, pen = model_1.apply(p, es_1, jnp.asarray(batch))
        return (
            optax.sigmoid_binary_cross_entropy(
                scores, jnp.asarray(labels)
            ).mean()
            + 0.01 * pen
        )

    loss_ref, grads_ref = jax.value_and_grad(loss_1)(params)
    upd, _ = tx.update(grads_ref, tx.init(params), params)
    params_ref = optax.apply_updates(params, upd)

    stacked = build_sharded_epoch_host(
        positives, n, r, tile, N_DEV, dropout_rate=0.5, keep_mask=keep,
        row_block=8, layout_chunk=tile,
    )
    step = make_sharded_lp_step_hosted(
        model_s, tx, mesh, num_nodes=n, decoder_l2_weight=0.01,
    )
    params_s, _, loss_s = step(
        params, tx.init(params), stacked, batch, labels, jax.random.key(8)
    )

    np.testing.assert_allclose(float(loss_s), float(loss_ref), rtol=1e-4)
    tree_allclose(params_s, params_ref, rtol=2e-4, atol=2e-5)


def test_sharded_training_driver_runs(mesh):
    """End-to-end multi-chip trainer (dist/driver.py) on a 2x4 mesh:
    host epoch pipeline -> hosted sharded step -> sharded evaluation."""
    import dataclasses

    from rgcn_tpu.config import load_experiment
    from rgcn_tpu.data.synthetic import synthetic_link_prediction
    from rgcn_tpu.dist.driver import train_link_predictor_sharded
    from rgcn_tpu.dist.multihost import make_mesh_2d
    from rgcn_tpu.utils.logging import ScalarLogger

    mesh2 = make_mesh_2d(num_replicas=2, edge_size=4)
    cfg = load_experiment("configs/rgcn/lp-FB-toy.yaml")
    cfg = dataclasses.replace(
        cfg,
        training=dataclasses.replace(cfg.training, graph_batch_size=128),
        evaluation=dataclasses.replace(cfg.evaluation, batch_size=16),
    )
    data = synthetic_link_prediction(
        num_nodes=120, num_rels=5, num_edges=600, seed=0
    )
    mrr, hits, ranks, params = train_link_predictor_sharded(
        cfg, data, mesh2, logger=ScalarLogger(verbose=False),
        max_epochs=2, tile_size=16,
    )
    assert np.isfinite(mrr) and len(ranks) == 2 * len(data.test)


def test_sharded_nc_step_ergcn_pallas_matches_single_device(mesh):
    """e-RGCN (diag first layer through the permute-free kernel +
    embedding L2) sharded == single device."""
    from rgcn_tpu.dist.mesh import prepare_sharded_layouts
    from rgcn_tpu.models import EmbeddingNodeClassifier

    rng = np.random.default_rng(28)
    n, r, c = 40, 4, 3
    triples = make_random_triples(rng, n, r, 150)
    train_idx = jnp.asarray(rng.choice(n, 12, replace=False))
    train_lbl = jnp.asarray(rng.integers(0, c, 12))

    kwargs = dict(num_nodes=n, num_relations=r, num_classes=c, emb_dim=8)
    model_s = EmbeddingNodeClassifier(
        axis_name=EDGE_AXIS, backend="pallas", **kwargs
    )
    model_1 = EmbeddingNodeClassifier(**kwargs)

    es_1 = build_edge_set(triples, n, r, tile_size=8)
    es_s = build_edge_set(triples, n, r, tile_size=8, tile_multiple=N_DEV)
    es_s = prepare_sharded_layouts(shard_edge_set(es_s, mesh), mesh, row_block=8)

    params = model_1.init(jax.random.key(0), es_1)
    tx = make_optimizer("sgd", 0.01)

    def loss_1(p):
        logits = model_1.apply(p, es_1)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits[train_idx], train_lbl
        ).mean() + 0.01 * model_1.embedding_l2(p)

    loss_ref, grads_ref = jax.value_and_grad(loss_1)(params)
    upd, _ = tx.update(grads_ref, tx.init(params), params)
    params_ref = optax.apply_updates(params, upd)

    step = make_sharded_nc_step(
        model_s, tx, mesh, train_idx, train_lbl, embedding_l2=0.01
    )
    params_s, _, loss_s = step(params, tx.init(params), es_s)

    np.testing.assert_allclose(float(loss_s), float(loss_ref), rtol=1e-5)
    tree_allclose(params_s, params_ref)


def test_sharded_training_resume_equivalence(mesh, tmp_path):
    """Distributed checkpoint/resume: 4 sharded epochs straight == 2 epochs
    with checkpointing + 2 resumed epochs, bit-comparable params and MRR.

    Proves the persisted state is complete (params + optimizer moments),
    the RNG schedule is epoch-indexed, and the process-0-writes /
    all-restore wrapper (dist/checkpoint.py) round-trips the replicated
    state exactly."""
    import dataclasses

    from rgcn_tpu.data.synthetic import synthetic_link_prediction
    from rgcn_tpu.dist.driver import train_link_predictor_sharded
    from rgcn_tpu.utils.logging import ScalarLogger

    cfg = load_experiment("configs/rgcn/lp-FB-toy.yaml")
    cfg = dataclasses.replace(
        cfg,
        training=dataclasses.replace(cfg.training, graph_batch_size=64),
        evaluation=dataclasses.replace(
            cfg.evaluation, batch_size=16, check_every=2
        ),
    )
    data = synthetic_link_prediction(
        num_nodes=80, num_rels=4, num_edges=400, seed=1
    )
    quiet = ScalarLogger(verbose=False)

    mrr_a, _, _, params_a = train_link_predictor_sharded(
        cfg, data, mesh, max_epochs=4, tile_size=16, logger=quiet,
    )

    ck = str(tmp_path / "ck")
    train_link_predictor_sharded(
        cfg, data, mesh, max_epochs=2, tile_size=16, logger=quiet,
        checkpoint_dir=ck,
    )
    mrr_b, _, _, params_b = train_link_predictor_sharded(
        cfg, data, mesh, max_epochs=4, tile_size=16, logger=quiet,
        checkpoint_dir=ck,
    )

    tree_allclose(params_a, params_b, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(mrr_a, mrr_b, rtol=1e-5)


def test_sharded_lp_step_hosted_structured_matches_single_device(mesh):
    """The STRUCTURED production decoder sharded over the scoring batch
    (host-built per-shard structured layouts + sorted scatter-free
    backward) == the single-device structured step — including a parent
    count that does NOT divide the mesh (pad parents carry zero loss and
    penalty weight)."""
    from rgcn_tpu.dist.host import (
        build_sharded_epoch_host,
        build_sharded_structured_host,
    )
    from rgcn_tpu.dist.train import make_sharded_lp_step_hosted_structured
    from rgcn_tpu.graph.dynamic import build_edge_set_dynamic_host
    from rgcn_tpu.ops.pallas_distmult import build_structured_layouts
    from rgcn_tpu.train.negative import corrupt_batch_host

    rng = np.random.default_rng(33)
    n, r = 48, 4
    triples = make_random_triples(rng, n, r, 200)
    bsz, num_neg, tile = 27, 3, 8  # 27 does not divide 8 devices

    kwargs = dict(
        num_nodes=n, num_relations=r, emb_dim=8, hidden1_size=8,
        num_layers=1, decomposition="basis", num_bases=2,
        weight_init="schlichtkrull-normal", bias_init="zeros",
        decoder_l2_type="schlichtkrull-l2", decoder_l2=0.01,
    )
    model_s = LinkPredictor(axis_name=EDGE_AXIS, backend="pallas", **kwargs)
    model_1 = LinkPredictor(backend="pallas", **kwargs)

    positives = triples[:bsz]
    keep = (rng.random(bsz) < 0.7).astype(np.float32)
    _b, _l, ch_np, ce_np = corrupt_batch_host(
        np.random.default_rng(3), positives, n, num_neg, 0.5,
        return_structure=True,
    )
    b_real = bsz * (1 + num_neg)

    es_1 = build_edge_set_dynamic_host(
        positives, n, r, tile_size=tile, dropout_rate=0.5, keep_mask=keep,
        with_dst_layout=True, row_block=8, layout_chunk=tile,
    )
    params = model_1.init(
        {"params": jax.random.key(5)}, es_1, jnp.asarray(positives)
    )
    tx = make_optimizer("sgd", 0.01)

    lays_1 = build_structured_layouts(
        positives, ce_np, n, row_block=16, chunk=16,
        sorted_corrupt=True, corrupt_head=ch_np,
    )
    labels_1 = jnp.concatenate(
        [jnp.ones(bsz), jnp.zeros(bsz * num_neg)]
    )
    pw_1 = jnp.full((b_real,), 1.0 / b_real, jnp.float32)

    def loss_1(p):
        scores, pen = model_1.apply(
            p, es_1, jnp.asarray(positives), jnp.asarray(ch_np),
            jnp.asarray(ce_np), pw_1, lays_1,
            method=model_1.structured_scores,
        )
        return (
            optax.sigmoid_binary_cross_entropy(scores, labels_1).mean()
            + 0.01 * pen
        )

    loss_ref, grads_ref = jax.value_and_grad(loss_1)(params)
    upd, _ = tx.update(grads_ref, tx.init(params), params)
    params_ref = optax.apply_updates(params, upd)

    stacked = build_sharded_epoch_host(
        positives, n, r, tile, N_DEV, dropout_rate=0.5, keep_mask=keep,
        row_block=8, layout_chunk=tile,
    )
    structured = build_sharded_structured_host(
        positives, ch_np, ce_np, n, N_DEV, row_block=16, chunk=16,
    )
    step = make_sharded_lp_step_hosted_structured(
        model_s, tx, mesh, decoder_l2_weight=0.01, num_nodes=n,
    )
    params_s, _, loss_s = step(
        params, tx.init(params), stacked, structured, jax.random.key(8)
    )

    np.testing.assert_allclose(float(loss_s), float(loss_ref), rtol=1e-4)
    tree_allclose(params_s, params_ref, rtol=2e-4, atol=2e-5)


def test_sharded_lp_step_hosted_structured_2d_mesh_exact():
    """The structured hosted step on a 2-D (replica x edge) mesh: edges
    stacked over the edge axis (4), structured inputs over all 8 devices —
    numerically equal to the single-device structured step."""
    from rgcn_tpu.dist.host import (
        build_sharded_epoch_host,
        build_sharded_structured_host,
    )
    from rgcn_tpu.dist.multihost import make_mesh_2d
    from rgcn_tpu.dist.train import make_sharded_lp_step_hosted_structured
    from rgcn_tpu.graph.dynamic import build_edge_set_dynamic_host
    from rgcn_tpu.ops.pallas_distmult import build_structured_layouts
    from rgcn_tpu.train.negative import corrupt_batch_host

    if len(jax.devices()) < N_DEV:
        pytest.skip("needs 8 virtual devices")
    mesh2 = make_mesh_2d(num_replicas=2, edge_size=4)
    edge_ax = mesh2.axis_names[-1]

    rng = np.random.default_rng(35)
    n, r = 40, 3
    triples = make_random_triples(rng, n, r, 160)
    bsz, num_neg, tile = 20, 3, 8

    kwargs = dict(
        num_nodes=n, num_relations=r, emb_dim=8, hidden1_size=8,
        num_layers=1, decomposition="basis", num_bases=2,
        weight_init="schlichtkrull-normal", bias_init="zeros",
        decoder_l2_type="schlichtkrull-l2", decoder_l2=0.01,
    )
    model_s = LinkPredictor(
        axis_name=edge_ax, decoder_axis_name=tuple(mesh2.axis_names),
        backend="pallas", **kwargs,
    )
    model_1 = LinkPredictor(backend="pallas", **kwargs)

    positives = triples[:bsz]
    _b, _l, ch_np, ce_np = corrupt_batch_host(
        np.random.default_rng(3), positives, n, num_neg, 0.5,
        return_structure=True,
    )
    b_real = bsz * (1 + num_neg)

    es_1 = build_edge_set_dynamic_host(
        positives, n, r, tile_size=tile,
        with_dst_layout=True, row_block=8, layout_chunk=tile,
    )
    params = model_1.init(
        {"params": jax.random.key(5)}, es_1, jnp.asarray(positives)
    )
    tx = make_optimizer("sgd", 0.01)

    lays_1 = build_structured_layouts(
        positives, ce_np, n, row_block=16, chunk=16,
        sorted_corrupt=True, corrupt_head=ch_np,
    )
    labels_1 = jnp.concatenate([jnp.ones(bsz), jnp.zeros(bsz * num_neg)])
    pw_1 = jnp.full((b_real,), 1.0 / b_real, jnp.float32)

    def loss_1(p):
        scores, pen = model_1.apply(
            p, es_1, jnp.asarray(positives), jnp.asarray(ch_np),
            jnp.asarray(ce_np), pw_1, lays_1,
            method=model_1.structured_scores,
        )
        return (
            optax.sigmoid_binary_cross_entropy(scores, labels_1).mean()
            + 0.01 * pen
        )

    loss_ref, grads_ref = jax.value_and_grad(loss_1)(params)
    upd, _ = tx.update(grads_ref, tx.init(params), params)
    params_ref = optax.apply_updates(params, upd)

    stacked = build_sharded_epoch_host(
        positives, n, r, tile, 4, row_block=8, layout_chunk=tile,
    )
    structured = build_sharded_structured_host(
        positives, ch_np, ce_np, n, mesh2.size, row_block=16, chunk=16,
    )
    step = make_sharded_lp_step_hosted_structured(
        model_s, tx, mesh2, decoder_l2_weight=0.01, num_nodes=n,
        axis_name=edge_ax,
    )
    params_s, _, loss_s = step(
        params, tx.init(params), stacked, structured, jax.random.key(8)
    )

    np.testing.assert_allclose(float(loss_s), float(loss_ref), rtol=1e-4)
    tree_allclose(params_s, params_ref, rtol=2e-4, atol=2e-5)


def test_sharded_nc_driver_matches_single_device(mesh):
    """The full sharded NC training driver (dist/driver.py) tracks the
    single-device trainer on the same config/data/seed. Adam + per-shard
    float reassociation drift individual updates, so the contract is
    metric-level: both learn, accuracies agree within a few points."""
    from rgcn_tpu.config import load_experiment
    from rgcn_tpu.data.synthetic import synthetic_node_classification
    from rgcn_tpu.dist.driver import train_node_classifier_sharded
    from rgcn_tpu.train.node_classification import train_node_classifier
    from rgcn_tpu.utils.logging import ScalarLogger

    data = synthetic_node_classification(
        num_nodes=200, num_rels=6, num_edges=1200, num_classes=3,
        labeled_frac=0.6, signal=0.9, seed=7,
    )
    cfg = load_experiment({
        "dataset": {"name": "synthetic"},
        "training": {"epochs": 50,
                     "optimiser": {"algorithm": "adam",
                                   "learn_rate": 0.01,
                                   "weight_decay": 0.0}},
        "rgcn": {"model": "rgcn", "num_layers": 2, "hidden_size": 8,
                 "decomposition": {"type": "basis", "num_bases": 3}},
        "evaluation": {"final_run": True},
    })
    quiet = ScalarLogger(verbose=False)
    acc_1 = train_node_classifier(cfg, data, seed=3, logger=quiet,
                                  tile_size=8)
    acc_s = train_node_classifier_sharded(
        cfg, data, mesh, seed=3, logger=quiet, tile_size=8,
        backend="pallas",
    )
    assert acc_1 >= 70.0 and acc_s >= 70.0, (acc_1, acc_s)
    assert abs(acc_1 - acc_s) <= 8.0, (acc_1, acc_s)
