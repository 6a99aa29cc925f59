"""Aggregation-first basis SpMM (ops/pallas_basis.py): forward and gradient
parity against the expand-then-dense XLA oracle, standalone and through
RGCNConv(backend='pallas') — interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np

from rgcn_tpu.graph.structure import build_edge_set
from rgcn_tpu.nn.layers import RGCNConv
from rgcn_tpu.ops.pallas_basis import rel_spmm_basis_ad
from rgcn_tpu.ops.spmm import rel_spmm
from tests.conftest import make_random_triples


def _setup(seed=5, n=64, r=5, e=300, din=16, dout=24, nb=3):
    rng = np.random.default_rng(seed)
    triples = make_random_triples(rng, n, r, e)
    es = build_edge_set(triples, n, r, tile_size=16, with_dst_layout=True)
    x = jnp.asarray(rng.normal(size=(n, din)).astype(np.float32))
    bases = jnp.asarray(rng.normal(size=(nb, din, dout)).astype(np.float32))
    comps = jnp.asarray(rng.normal(size=(2 * r, nb)).astype(np.float32))
    return es, x, bases, comps


def test_basis_forward_matches_dense_oracle():
    es, x, bases, comps = _setup()
    w = jnp.einsum("rb,bio->rio", comps, bases)
    want = np.asarray(rel_spmm(es, x, w))
    got = np.asarray(rel_spmm_basis_ad(es, x, bases, comps, compute_dtype=None))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_weighted_aggregate_bf16_out_matches_f32():
    """out_dtype=bfloat16 accumulates chunk partials in an f32 VMEM scratch
    and narrows only on each row block's closing chunk — results must match
    the f32 aggregate to bf16 rounding (NOT bf16-accumulation error)."""
    from rgcn_tpu.ops.pallas_basis import (
        _sorted_inputs,
        weighted_aggregate_pallas,
    )

    es, x, bases, comps = _setup(seed=11)
    src_sorted, wvec = _sorted_inputs(es, comps)
    xg = x[src_sorted]
    f32 = np.asarray(
        weighted_aggregate_pallas(
            xg, wvec, es.layout, es.num_nodes, compute_dtype=None
        )
    )
    bf16 = np.asarray(
        weighted_aggregate_pallas(
            xg, wvec, es.layout, es.num_nodes, compute_dtype=None,
            out_dtype=jnp.bfloat16,
        ).astype(jnp.float32)
    )
    # single-rounding tolerance: bf16 has an 8-bit mantissa
    np.testing.assert_allclose(bf16, f32, rtol=8e-3, atol=8e-3)
    # and the summed-over-bases (backward) mode
    f32s = np.asarray(
        weighted_aggregate_pallas(
            xg, wvec, es.layout, es.num_nodes, compute_dtype=None,
            sum_bases=True,
        )
    )
    bf16s = np.asarray(
        weighted_aggregate_pallas(
            xg, wvec, es.layout, es.num_nodes, compute_dtype=None,
            sum_bases=True, out_dtype=jnp.bfloat16,
        ).astype(jnp.float32)
    )
    np.testing.assert_allclose(bf16s, f32s, rtol=8e-3, atol=8e-3)


def test_basis_gradients_match_dense_oracle():
    es, x, bases, comps = _setup()

    def loss_basis(x, bases, comps):
        return jnp.sum(
            jnp.sin(rel_spmm_basis_ad(es, x, bases, comps, compute_dtype=None))
        )

    def loss_dense(x, bases, comps):
        w = jnp.einsum("rb,bio->rio", comps, bases)
        return jnp.sum(jnp.sin(rel_spmm(es, x, w)))

    g1 = jax.grad(loss_basis, argnums=(0, 1, 2))(x, bases, comps)
    g2 = jax.grad(loss_dense, argnums=(0, 1, 2))(x, bases, comps)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        )


def test_rgcnconv_basis_pallas_matches_xla():
    """The layer's basis branch routes through the aggregation-first kernel
    when backend='pallas'; outputs and parameter gradients must match the
    XLA branch."""
    rng = np.random.default_rng(9)
    n, r, d = 48, 4, 12
    triples = make_random_triples(rng, n, r, 200)
    es = build_edge_set(triples, n, r, tile_size=16, with_dst_layout=True)
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))

    kwargs = dict(
        num_nodes=n, num_relations=2 * r + 1, in_features=d, out_features=d,
        decomposition="basis", num_bases=2,
    )
    layer_x = RGCNConv(backend="xla", **kwargs)
    layer_p = RGCNConv(backend="pallas", **kwargs)
    params = layer_x.init(jax.random.key(0), es, x)

    want = np.asarray(layer_x.apply(params, es, x))
    got = np.asarray(layer_p.apply(params, es, x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)

    def loss(apply_fn, p):
        return jnp.sum(jnp.tanh(apply_fn(p, es, x)))

    gx = jax.grad(lambda p: loss(layer_x.apply, p))(params)
    gp = jax.grad(lambda p: loss(layer_p.apply, p))(params)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gx)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        )


def test_rgcnconv_diag_pallas_matches_xla():
    """The diag branch's permute-free sorted-message path
    (ops/pallas_diag.py) — outputs and gradients vs the XLA branch."""
    rng = np.random.default_rng(10)
    n, r, d = 48, 4, 16
    triples = make_random_triples(rng, n, r, 200)
    es = build_edge_set(triples, n, r, tile_size=16, with_dst_layout=True)
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))

    kwargs = dict(
        num_nodes=n, num_relations=2 * r + 1, in_features=d, out_features=d,
        diag=True,
    )
    layer_x = RGCNConv(backend="xla", **kwargs)
    layer_p = RGCNConv(backend="pallas", **kwargs)
    params = layer_x.init(jax.random.key(0), es, x)

    want = np.asarray(layer_x.apply(params, es, x))
    got = np.asarray(layer_p.apply(params, es, x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)

    def loss(apply_fn, p, x):
        return jnp.sum(jnp.tanh(apply_fn(p, es, x)))

    gx = jax.grad(lambda p, x: loss(layer_x.apply, p, x), argnums=(0, 1))(params, x)
    gp = jax.grad(lambda p, x: loss(layer_p.apply, p, x), argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gx)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        )


def test_featureless_basis_pallas_matches_xla():
    """Aggregation-first featureless-basis kernel — forward and gradients
    vs the per-tile contraction oracle, through RGCNConv (NC first layer,
    the AM-class configuration)."""
    rng = np.random.default_rng(11)
    n, r = 40, 5
    triples = make_random_triples(rng, n, r, 180)
    es = build_edge_set(triples, n, r, tile_size=16, with_dst_layout=True)

    kwargs = dict(
        num_nodes=n, num_relations=2 * r + 1, in_features=None,
        out_features=12, decomposition="basis", num_bases=3,
    )
    layer_x = RGCNConv(backend="xla", **kwargs)
    layer_p = RGCNConv(backend="pallas", **kwargs)
    params = layer_x.init(jax.random.key(0), es)

    want = np.asarray(layer_x.apply(params, es))
    got = np.asarray(layer_p.apply(params, es))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)

    def loss(apply_fn, p):
        return jnp.sum(jnp.tanh(apply_fn(p, es)))

    gx = jax.grad(lambda p: loss(layer_x.apply, p))(params)
    gp = jax.grad(lambda p: loss(layer_p.apply, p))(params)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gx)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        )


def test_rgcnconv_block_pallas_matches_xla():
    """Block decomposition (FB-toy class): XLA tile-einsum messages +
    Pallas sorted aggregation vs the pure XLA branch — forward and
    gradients (incl. the separate-self-weight LP layout)."""
    rng = np.random.default_rng(12)
    n, r, d = 48, 4, 16
    triples = make_random_triples(rng, n, r, 200)
    es = build_edge_set(triples, n, r, tile_size=16, with_dst_layout=True)
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))

    kwargs = dict(
        num_nodes=n, num_relations=2 * r + 1, in_features=d, out_features=d,
        decomposition="block", num_blocks=4, separate_self_weight=True,
        weight_init="schlichtkrull-normal",
    )
    layer_x = RGCNConv(backend="xla", **kwargs)
    layer_p = RGCNConv(backend="pallas", **kwargs)
    params = layer_x.init(jax.random.key(0), es, x)

    want = np.asarray(layer_x.apply(params, es, x))
    got = np.asarray(layer_p.apply(params, es, x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)

    def loss(apply_fn, p, x):
        return jnp.sum(jnp.tanh(apply_fn(p, es, x)))

    gx = jax.grad(lambda p, x: loss(layer_x.apply, p, x), argnums=(0, 1))(params, x)
    gp = jax.grad(lambda p, x: loss(layer_p.apply, p, x), argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gx)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        )


def test_distmult_scatter_free_backward_matches_xla():
    """The scatter-free DistMult custom VJP (ops/pallas_distmult.py):
    scores and (d nodes, d relations) must match XLA autodiff exactly
    (interpret-mode aggregation on CPU)."""
    from rgcn_tpu.ops.distmult import distmult_score
    from rgcn_tpu.ops.pallas_distmult import (
        build_batch_layouts,
        distmult_score_agg_ad,
    )

    rng = np.random.default_rng(13)
    n, r, d, b = 50, 5, 16, 300
    batch_np = np.stack([rng.integers(0, n, b), rng.integers(0, r, b),
                         rng.integers(0, n, b)], axis=1)
    triples = jnp.asarray(batch_np)
    nodes = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    rels = jnp.asarray(rng.normal(size=(r, d)).astype(np.float32))
    layouts = build_batch_layouts(batch_np, n, row_block=8, chunk=16)

    want_s = np.asarray(distmult_score(triples, nodes, rels))
    got_s = np.asarray(distmult_score_agg_ad(triples, nodes, rels, layouts))
    np.testing.assert_allclose(got_s, want_s, rtol=1e-6, atol=1e-6)

    def loss_x(nodes, rels):
        return jnp.sum(jnp.sin(distmult_score(triples, nodes, rels)))

    def loss_p(nodes, rels):
        return jnp.sum(
            jnp.sin(distmult_score_agg_ad(triples, nodes, rels, layouts))
        )

    gx = jax.grad(loss_x, argnums=(0, 1))(nodes, rels)
    gp = jax.grad(loss_p, argnums=(0, 1))(nodes, rels)
    for a, b_ in zip(gp, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-5, atol=1e-5
        )


def test_lp_model_fused_score_penalty_matches_xla():
    """LinkPredictor with host batch layouts routes score+penalty through
    the fused scatter-free VJP; loss and parameter gradients must match
    the plain XLA path."""
    from rgcn_tpu.graph.structure import build_edge_set as _bes
    from rgcn_tpu.models import LinkPredictor
    from rgcn_tpu.ops.pallas_distmult import build_batch_layouts

    rng = np.random.default_rng(14)
    n, r = 48, 4
    triples = make_random_triples(rng, n, r, 200)
    batch_np = np.stack(
        [rng.integers(0, n, 120), rng.integers(0, r, 120),
         rng.integers(0, n, 120)], axis=1,
    )
    batch = jnp.asarray(batch_np)
    edges = _bes(triples, n, r, tile_size=16, with_dst_layout=True)
    layouts = build_batch_layouts(batch_np, n, row_block=8, chunk=16)

    kwargs = dict(
        num_nodes=n, num_relations=r, emb_dim=8, hidden1_size=8,
        num_layers=1, weight_init="schlichtkrull-normal", bias_init="zeros",
        decoder_l2_type="schlichtkrull-l2", decoder_l2=0.01,
    )
    m_x = LinkPredictor(backend="xla", **kwargs)
    m_p = LinkPredictor(backend="pallas", **kwargs)
    params = m_x.init({"params": jax.random.key(2)}, edges, batch)

    def loss(model, p, bl):
        scores, pen = model.apply(p, edges, batch, batch_layouts=bl)
        return jnp.mean(jnp.tanh(scores)) + 0.01 * pen

    lx, gx = jax.value_and_grad(lambda p: loss(m_x, p, None))(params)
    lp, gp = jax.value_and_grad(lambda p: loss(m_p, p, layouts))(params)
    np.testing.assert_allclose(float(lp), float(lx), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gx)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_distmult_structured_matches_assembled_batch():
    """Structured negative scoring == scoring the assembled
    [positives; negatives] batch, for scores, penalty and all gradients."""
    from rgcn_tpu.ops.distmult import distmult_score
    from rgcn_tpu.ops.pallas_distmult import (
        build_structured_layouts,
        distmult_structured_agg_ad,
    )

    rng = np.random.default_rng(15)
    n, r, d, P, ns = 40, 4, 12, 30, 5
    pos_np = np.stack([rng.integers(0, n, P), rng.integers(0, r, P),
                       rng.integers(0, n, P)], axis=1)
    ch_np = rng.random(P * ns) < 0.5
    ce_np = rng.integers(0, n, P * ns)

    # assemble the equivalent batch the way corrupt_batch does
    exp = np.repeat(pos_np, ns, axis=0)
    s_neg = np.where(ch_np, ce_np, exp[:, 0])
    o_neg = np.where(ch_np, exp[:, 2], ce_np)
    batch_np = np.concatenate(
        [pos_np, np.stack([s_neg, exp[:, 1], o_neg], axis=1)], axis=0
    )
    B = len(batch_np)
    pw = np.full(B, 1.0 / B, np.float32)

    nodes = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    rels = jnp.asarray(rng.normal(size=(r, d)).astype(np.float32))
    layouts = build_structured_layouts(pos_np, ce_np, n, row_block=8, chunk=16)

    pos = jnp.asarray(pos_np)
    ch = jnp.asarray(ch_np)
    ce = jnp.asarray(ce_np)
    batch = jnp.asarray(batch_np)
    pw_j = jnp.asarray(pw)

    def oracle(nodes, rels):
        sc = distmult_score(batch, nodes, rels)
        zb = nodes[batch[:, 0]]
        rb_ = rels[batch[:, 1]]
        ob = nodes[batch[:, 2]]
        per_row = (
            jnp.mean(zb**2, -1) + jnp.mean(rb_**2, -1) + jnp.mean(ob**2, -1)
        )
        return sc, jnp.sum(per_row * pw_j)

    def structured(nodes, rels):
        return distmult_structured_agg_ad(
            pos, ch, ce, nodes, rels, pw_j, layouts
        )

    sc_o, pen_o = oracle(nodes, rels)
    sc_s, pen_s = structured(nodes, rels)
    np.testing.assert_allclose(np.asarray(sc_s), np.asarray(sc_o),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(pen_s), float(pen_o), rtol=1e-5)

    def loss(fn, nodes, rels):
        sc, pen = fn(nodes, rels)
        return jnp.mean(jnp.tanh(sc)) + 0.01 * pen

    go = jax.grad(lambda nz, rl: loss(oracle, nz, rl), argnums=(0, 1))(nodes, rels)
    gt = jax.grad(lambda nz, rl: loss(structured, nz, rl), argnums=(0, 1))(nodes, rels)
    for a, b in zip(gt, go):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)

    # layout-free mode (layouts=None — fully in-jit steps, plain-AD
    # backward): forward bit-identical to the layout path (same
    # expression), gradients allclose to the oracle
    def structured_free(nodes, rels):
        return distmult_structured_agg_ad(
            pos, ch, ce, nodes, rels, pw_j, None
        )

    sc_f, pen_f = structured_free(nodes, rels)
    assert np.array_equal(np.asarray(sc_f), np.asarray(sc_s))
    assert float(pen_f) == float(pen_s)
    gf = jax.grad(lambda nz, rl: loss(structured_free, nz, rl),
                  argnums=(0, 1))(nodes, rels)
    for a, b in zip(gf, go):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_negative_structure_matches_sampling():
    """negative_structure's draws are bit-identical to negative_sampling's
    (same key split, same draw shapes), so the in-jit trainer's structured
    branch keeps the exact negative schedule of the materialized path."""
    from rgcn_tpu.train.negative import negative_sampling, negative_structure

    rng = np.random.default_rng(21)
    P, n, ns = 40, 100, 7
    pos = jnp.asarray(np.stack([
        rng.integers(0, n, P), rng.integers(0, 5, P), rng.integers(0, n, P)
    ], axis=1))
    key = jax.random.key(9)
    neg = np.asarray(negative_sampling(key, pos, n, ns, 0.5))
    ce, ch, labels = negative_structure(key, pos, n, ns, 0.5)
    exp = np.repeat(np.asarray(pos), ns, axis=0)
    s = np.where(np.asarray(ch), np.asarray(ce), exp[:, 0])
    o = np.where(np.asarray(ch), exp[:, 2], np.asarray(ce))
    assert np.array_equal(neg, np.stack([s, exp[:, 1], o], axis=1))
    assert np.array_equal(np.asarray(labels),
                          np.concatenate([np.ones(P), np.zeros(P * ns)]))


def test_tile_gather_exact():
    from rgcn_tpu.ops.gather import tile_gather

    rng = np.random.default_rng(16)
    for shape in ((50, 300), (50, 128), (50, 37), (50, 3, 100)):
        t = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, 50, 77))
        np.testing.assert_array_equal(
            np.asarray(tile_gather(t, idx)), np.asarray(t[idx])
        )


def test_basis_blocks_fused_activation_matches_oracle():
    """Feature-block basis op (gather from parameter blocks with fused
    relu) == relu-then-dense-SpMM oracle, for outputs and all gradients."""
    from rgcn_tpu.ops.pallas_basis import rel_spmm_basis_blocks_ad

    rng = np.random.default_rng(17)
    n, r, e, d0, d1, dout, nb = 60, 4, 300, 16, 8, 24, 2
    din = d0 + d1
    triples = make_random_triples(rng, n, r, e)
    es = build_edge_set(triples, n, r, tile_size=16, with_dst_layout=True)
    b0 = jnp.asarray(rng.normal(size=(n, d0)).astype(np.float32))
    b1 = jnp.asarray(rng.normal(size=(n, d1)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(1, din)).astype(np.float32))
    bases = jnp.asarray(rng.normal(size=(nb, din, dout)).astype(np.float32))
    comps = jnp.asarray(rng.normal(size=(2 * r, nb)).astype(np.float32))

    def oracle(b0, b1, bias, bases, comps):
        x = jax.nn.relu(jnp.concatenate([b0, b1], axis=1) + bias)
        w = jnp.einsum("rb,bio->rio", comps, bases)
        return rel_spmm(es, x, w)

    def blocks(b0, b1, bias, bases, comps):
        return rel_spmm_basis_blocks_ad(
            es, (b0, b1), bias, bases, comps, compute_dtype=None
        )

    want = np.asarray(oracle(b0, b1, bias, bases, comps))
    got = np.asarray(blocks(b0, b1, bias, bases, comps))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)

    def loss(fn, *args):
        return jnp.sum(jnp.sin(fn(*args)))

    go = jax.grad(lambda *a: loss(oracle, *a), argnums=tuple(range(5)))(
        b0, b1, bias, bases, comps
    )
    gb = jax.grad(lambda *a: loss(blocks, *a), argnums=tuple(range(5)))(
        b0, b1, bias, bases, comps
    )
    for a, b in zip(gb, go):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        )


def test_lp_model_feature_blocks_matches_monolithic():
    """LinkPredictor(feature_blocks=True) == the monolithic-embedding model
    given equivalent parameters (blocks = column slices), outputs and
    gradients, through the Pallas basis path."""
    from rgcn_tpu.graph.structure import build_edge_set as _bes
    from rgcn_tpu.models import LinkPredictor

    rng = np.random.default_rng(18)
    n, r = 48, 4
    triples = make_random_triples(rng, n, r, 200)
    batch = jnp.asarray(
        np.stack([rng.integers(0, n, 80), rng.integers(0, r, 80),
                  rng.integers(0, n, 80)], axis=1)
    )
    edges = _bes(triples, n, r, tile_size=16, with_dst_layout=True)

    kwargs = dict(
        num_nodes=n, num_relations=r, emb_dim=200, hidden1_size=200,
        num_layers=1, decomposition="basis", num_bases=2,
        weight_init="schlichtkrull-normal", bias_init="zeros",
    )
    m_mono = LinkPredictor(backend="pallas", **kwargs)
    m_blk = LinkPredictor(backend="pallas", feature_blocks=True, **kwargs)

    p_mono = m_mono.init({"params": jax.random.key(4)}, edges, batch)
    # build equivalent block params from the monolithic embedding
    emb = p_mono["params"]["node_embeddings"]
    p_blk = jax.tree.map(lambda x: x, p_mono)
    inner = dict(p_blk["params"])
    inner.pop("node_embeddings")
    inner["node_embeddings_block0"] = emb[:, :128]
    inner["node_embeddings_block1"] = emb[:, 128:]
    p_blk = {"params": inner}

    def loss(model, p):
        scores, pen = model.apply(p, edges, batch)
        return jnp.mean(jnp.tanh(scores))

    l_mono, g_mono = jax.value_and_grad(lambda p: loss(m_mono, p))(p_mono)
    l_blk, g_blk = jax.value_and_grad(lambda p: loss(m_blk, p))(p_blk)
    np.testing.assert_allclose(float(l_blk), float(l_mono), rtol=1e-5)
    # embedding grads: concat of block grads == monolithic grad
    ge_mono = np.asarray(g_mono["params"]["node_embeddings"])
    ge_blk = np.concatenate(
        [np.asarray(g_blk["params"]["node_embeddings_block0"]),
         np.asarray(g_blk["params"]["node_embeddings_block1"])], axis=1,
    )
    np.testing.assert_allclose(ge_blk, ge_mono, rtol=1e-4, atol=1e-5)
    for name in ("rgc1", "scoring_function", "node_embeddings_bias"):
        for a, b in zip(jax.tree.leaves(g_blk["params"][name]),
                        jax.tree.leaves(g_mono["params"][name])):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
            )


def test_distmult_structured_sorted_backward_exact():
    """The sorted-order corrupted-entity backward (sorted_corrupt=True
    layouts: two weighted in-pipeline-gather aggregations in layout order)
    computes the same per-slot products as the batch-order path; only the
    score/penalty term association differs, so gradients must agree to
    f32 reassociation tolerance and the forward bit-exactly."""
    from rgcn_tpu.ops.pallas_distmult import (
        build_structured_layouts,
        distmult_structured_agg_ad,
    )

    rng = np.random.default_rng(31)
    n, p_cnt, ns, d, r = 300, 64, 5, 24, 6
    pos_np = np.stack(
        [rng.integers(0, n, p_cnt), rng.integers(0, r, p_cnt),
         rng.integers(0, n, p_cnt)], axis=1,
    )
    ce_np = rng.integers(0, n, p_cnt * ns)
    ch_np = rng.random(p_cnt * ns) < 0.5
    nodes = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    rels = jnp.asarray(rng.normal(size=(r, d)).astype(np.float32))
    pw = jnp.asarray(
        rng.random(p_cnt * (1 + ns)).astype(np.float32)
    ) / (p_cnt * (1 + ns))
    pos, ch, ce = jnp.asarray(pos_np), jnp.asarray(ch_np), jnp.asarray(ce_np)

    plain = build_structured_layouts(pos_np, ce_np, n, row_block=16,
                                     chunk=32)
    srt = build_structured_layouts(pos_np, ce_np, n, row_block=16,
                                   chunk=32, sorted_corrupt=True,
                                   corrupt_head=ch_np)
    assert len(srt) == 4

    def loss(nodes, rels, lays):
        sc, pen = distmult_structured_agg_ad(
            pos, ch, ce, nodes, rels, pw, lays
        )
        return jnp.sum(jnp.sin(sc)) + 3.0 * pen

    v0, g0 = jax.value_and_grad(loss, argnums=(0, 1))(nodes, rels, plain)
    v1, g1 = jax.value_and_grad(loss, argnums=(0, 1))(nodes, rels, srt)
    assert float(v0) == float(v1)  # forward path is shared
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )

    # split geometry (production uses larger row blocks for the P-sized
    # subject/object layouts and the whole structured set; exactness must
    # be geometry-independent, incl. row_block > num_nodes)
    for kwargs in (
        dict(row_block=16, chunk=32, p_row_block=64, p_chunk=16),
        dict(row_block=512, chunk=256),
    ):
        srt_g = build_structured_layouts(
            pos_np, ce_np, n, sorted_corrupt=True, corrupt_head=ch_np,
            **kwargs,
        )
        vg, gg = jax.value_and_grad(loss, argnums=(0, 1))(
            nodes, rels, srt_g
        )
        assert float(vg) == float(v0)
        for a, b in zip(g0, gg):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
            )

    # narrow-backward option (decoder.bwd_dtype): the forward is computed
    # before any narrowing, so value/scores must stay BIT-identical; the
    # gradients are the same sums over bf16-rounded rows — close at bf16
    # tolerance, not equal.
    def loss_bf16(nodes, rels, lays):
        sc, pen = distmult_structured_agg_ad(
            pos, ch, ce, nodes, rels, pw, lays, bwd_dtype=jnp.bfloat16
        )
        return jnp.sum(jnp.sin(sc)) + 3.0 * pen

    for lays in (plain, srt):
        vb, gb = jax.value_and_grad(loss_bf16, argnums=(0, 1))(
            nodes, rels, lays
        )
        assert float(vb) == float(v0)  # forward unaffected by bwd_dtype
        for a, b in zip(g0, gb):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=3e-2, atol=3e-2
            )
