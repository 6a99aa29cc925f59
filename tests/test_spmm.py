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


def test_basis_paths_bf16_compute_dtype_close():
    """compute_dtype=bfloat16 (the real-TPU default for the basis paths,
    f32 accumulation) must track the f32 forward and gradients to bf16
    tolerances on BOTH the featureless (pair + tile) and featureful pair
    paths."""
    import jax

    rng = np.random.default_rng(12)
    n, r, nb, din, dout = 30, 4, 5, 6, 7
    triples = make_random_triples(rng, 12, r, 90, unique=True)
    bases_fl = jnp.asarray(rng.normal(size=(nb, n, dout)).astype(np.float32))
    bases_ff = jnp.asarray(
        rng.normal(size=(nb, din, dout)).astype(np.float32)
    )
    comps = jnp.asarray(rng.normal(size=(2 * r, nb)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(n, din)).astype(np.float32))

    es = build_edge_set(triples, n, r, tile_size=8)
    es_p = build_edge_set(triples, n, r, tile_size=8, with_pair_index=True)

    def check(fn, *args):
        def loss(*a):
            out = fn(*a)
            return jnp.sum(out * out), out

        (v0, out0), g0 = jax.value_and_grad(
            loss, argnums=tuple(range(len(args))), has_aux=True
        )(*args)

        def loss16(*a):
            out = fn(*a, compute_dtype=jnp.bfloat16)
            return jnp.sum(out * out), out

        (v1, out1), g1 = jax.value_and_grad(
            loss16, argnums=tuple(range(len(args))), has_aux=True
        )(*args)
        out0np, out1np = np.asarray(out0), np.asarray(out1)
        np.testing.assert_allclose(out1np, out0np, rtol=5e-2, atol=5e-2)
        rel_out = np.linalg.norm(out1np - out0np) / np.linalg.norm(out0np)
        assert rel_out <= 1e-2, rel_out
        for a, b in zip(g1, g0):
            assert a.dtype == b.dtype  # grads stay f32 param dtype
            # gradients are bf16-class (the cotangent quantizes through
            # the cast, like the Pallas basis kernels' TPU default —
            # tpu-smoke gates those at the same tolerance class):
            # assert relative L2 per leaf, not elementwise
            a, b = np.asarray(a), np.asarray(b)
            rel = np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)
            assert rel <= 2e-2, rel

    check(
        lambda b, c, **kw: spmm.rel_spmm_featureless_basis(es, b, c, **kw),
        bases_fl, comps,
    )
    check(
        lambda b, c, **kw: spmm.rel_spmm_featureless_basis(es_p, b, c, **kw),
        bases_fl, comps,
    )
    check(
        lambda x_, b, c, **kw: spmm.rel_spmm_basis_pairs(
            es_p, x_, b, c, **kw
        ),
        x, bases_ff, comps,
    )


def _grad_check(f_got, f_want, args, rtol=1e-4, atol=1e-5):
    import jax

    (v1, out1), g1 = jax.value_and_grad(
        f_got, argnums=tuple(range(len(args))), has_aux=True
    )(*args)
    (v0, out0), g0 = jax.value_and_grad(
        f_want, argnums=tuple(range(len(args))), has_aux=True
    )(*args)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out0),
                               rtol=rtol, atol=atol)
    for a, b in zip(g1, g0):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=rtol, atol=atol)


def test_composed_pair_aggregation_exact():
    """The composed pair aggregation (fan-out fused into the Pallas
    layout kernel, scatter-free layout backward —
    ``pallas_aggregate.aggregate_pairs_ad``) must equal the explicit
    fan-out + segment_sum path: forward AND gradients w.r.t.
    bases/comps/x, on both basis pair paths, including after runtime
    reweighting (``reweight_edge_set`` — drops the value-frozen
    slot_val/grad_val snapshots, keeps the composed maps)."""
    from rgcn_tpu.ops.pallas_aggregate import aggregate_messages_ad

    rng = np.random.default_rng(13)
    n, r, nb, din, dout = 30, 4, 5, 6, 7
    triples = make_random_triples(rng, 12, r, 90, unique=True)
    bases_fl = jnp.asarray(rng.normal(size=(nb, n, dout)).astype(np.float32))
    bases_ff = jnp.asarray(
        rng.normal(size=(nb, din, dout)).astype(np.float32)
    )
    comps = jnp.asarray(rng.normal(size=(2 * r, nb)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(n, din)).astype(np.float32))

    es = build_edge_set(
        triples, n, r, tile_size=8, with_pair_index=True,
        with_pair_agg=True,
        with_dst_layout=True, layout_row_block=16, layout_chunk=8,
    )
    assert es.pairs.agg is not None
    assert es.pairs.agg.slot_val is not None  # static-val fast path built
    # reweighted variant: reweight_edge_set drops the value-composed
    # arrays (slot_val/grad_val freeze val) but KEEPS the composed maps —
    # a val mask must stay exact through the composed path's in-jit
    # val-gather fallback
    from rgcn_tpu.graph.structure import reweight_edge_set

    mask = (rng.random(es.val.shape[0]) > 0.3).astype(np.float32)
    es_masked = reweight_edge_set(
        es, jnp.asarray(np.asarray(es.val) * mask)
    )
    assert es_masked.pairs.agg.slot_val is None
    # every value-frozen snapshot must be gone (fused + reverse carry
    # build-time val copies the Pallas custom-VJP kernels would read)
    assert es_masked.merged is None
    assert es_masked.fused is None and es_masked.reverse is None

    for es_ in (es, es_masked):
        def fused_fl(b, c):
            out = spmm.rel_spmm_featureless_basis(
                es_, b, c, aggregate=aggregate_messages_ad
            )
            return jnp.sum(out * out), out

        def plain_fl(b, c):
            out = spmm.rel_spmm_featureless_basis(es_, b, c)
            return jnp.sum(out * out), out

        _grad_check(fused_fl, plain_fl, (bases_fl, comps))

        def fused_ff(x_, b, c):
            out = spmm.rel_spmm_basis_pairs(
                es_, x_, b, c, aggregate=aggregate_messages_ad
            )
            return jnp.sum(out * out), out

        def plain_ff(x_, b, c):
            out = spmm.rel_spmm_basis_pairs(es_, x_, b, c)
            return jnp.sum(out * out), out

        _grad_check(fused_ff, plain_ff, (x, bases_ff, comps))


def test_composed_pair_aggregation_val_grad():
    """aggregate_pairs_ad's custom VJP declares a REAL d_val (val is
    graph data, but the cotangent must be correct if anyone ever
    differentiates through a value-producing function)."""
    import jax

    from rgcn_tpu.ops.pallas_aggregate import aggregate_pairs_ad
    from rgcn_tpu.ops.spmm import aggregate_messages

    rng = np.random.default_rng(14)
    n, r = 20, 3
    triples = make_random_triples(rng, 10, r, 60, unique=True)
    es = build_edge_set(
        triples, n, r, tile_size=8, with_pair_index=True,
        with_pair_agg=True,
        with_dst_layout=True, layout_row_block=16, layout_chunk=8,
    )
    dout = 5
    m = jnp.asarray(
        rng.normal(size=(es.pairs.pair_src.shape[0], dout)).astype(
            np.float32
        )
    )
    val0 = jnp.asarray(np.asarray(es.val))

    def fused(mm, vv):
        return jnp.sum(
            aggregate_pairs_ad(
                mm, vv, es.pairs.edge_pair, es.dst, es.pairs.agg,
                es.layout, es.num_nodes,
            )
            ** 2
        )

    def plain(mm, vv):
        msgs = mm[es.pairs.edge_pair] * vv[:, None]
        return jnp.sum(aggregate_messages(msgs, es.dst, es.num_nodes) ** 2)

    gm1, gv1 = jax.grad(fused, argnums=(0, 1))(m, val0)
    gm0, gv0 = jax.grad(plain, argnums=(0, 1))(m, val0)
    np.testing.assert_allclose(np.asarray(gm1), np.asarray(gm0),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gv1), np.asarray(gv0),
                               rtol=1e-4, atol=1e-5)


def test_node_classifier_composed_pair_agg_matches():
    """Whole-model check of the composed pair aggregation: a forced
    Pallas backend (interpret mode on CPU) over an agg-carrying EdgeSet
    must match the plain XLA path — logits AND training gradients."""
    import jax

    from rgcn_tpu.models import NodeClassifier

    rng = np.random.default_rng(15)
    n, r, c = 30, 4, 3
    triples = make_random_triples(rng, 15, r, 90, unique=True)
    es = build_edge_set(
        triples, n, r, tile_size=8, with_pair_index=True,
        with_pair_agg=True,
        with_dst_layout=True, layout_row_block=16, layout_chunk=8,
    )
    assert es.pairs.agg is not None

    kw = dict(
        num_nodes=n, num_relations=r, num_classes=c, hidden_size=8,
        decomposition="basis", num_bases=10,
    )
    pallas_model = NodeClassifier(backend="pallas", **kw)
    xla_model = NodeClassifier(backend="xla", **kw)
    params = xla_model.init(jax.random.key(0), es)

    out_p = np.asarray(pallas_model.apply(params, es))
    out_x = np.asarray(xla_model.apply(params, es))
    np.testing.assert_allclose(out_p, out_x, rtol=1e-4, atol=1e-5)

    lbl = jnp.asarray(rng.integers(0, c, n))

    def loss(model):
        def f(p):
            import optax

            return optax.softmax_cross_entropy_with_integer_labels(
                model.apply(p, es), lbl
            ).mean()

        return f

    g_p = jax.grad(loss(pallas_model))(params)
    g_x = jax.grad(loss(xla_model))(params)
    for a, b in zip(jax.tree.leaves(g_p), jax.tree.leaves(g_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("featureful", [False, True])
def test_fan_agg_lane_pad_exact(featureful, monkeypatch):
    """The lane-padded fan+agg pipeline (``spmm._FAN_AGG_PAD``) == the
    compact path: forward AND gradients, both pair paths (featureless
    layer-1 and H-precompute layer-2 analogs). Pad columns are zeros
    end-to-end, so the slice-back must be exact, not just allclose —
    (f32 reassociation tolerances: the wider shapes change XLA's
    fusion/accumulation order at the last bit)."""
    import dataclasses as _dc

    import jax

    from rgcn_tpu.ops.pallas_aggregate import aggregate_messages_ad

    rng = np.random.default_rng(11)
    n, r, nb, dout = 30, 4, 5, 6
    triples = make_random_triples(rng, 12, r, 90, unique=True)
    bases_fl = jnp.asarray(rng.normal(size=(nb, n, dout)).astype(np.float32))
    din = 7
    x = jnp.asarray(rng.normal(size=(n, din)).astype(np.float32))
    bases_ff = jnp.asarray(
        rng.normal(size=(nb, din, dout)).astype(np.float32)
    )
    comps = jnp.asarray(rng.normal(size=(2 * r, nb)).astype(np.float32))

    es = build_edge_set(
        triples, n, r, tile_size=8, with_dst_layout=True,
        with_pair_index=True,
    )
    # strip the composed layout if present: the padded branch is the
    # EXPLICIT fan-out path
    if es.pairs.agg is not None:
        es = _dc.replace(es, pairs=_dc.replace(es.pairs, agg=None))
    assert es.layout is not None and es.pairs is not None

    def f(pad):
        monkeypatch.setattr(spmm, "_FAN_AGG_PAD", pad)

        def loss(b, c):
            if featureful:
                out = spmm.rel_spmm_basis_pairs(
                    es, x, b, c, aggregate=aggregate_messages_ad
                )
            else:
                out = spmm.rel_spmm_featureless_basis(
                    es, b, c, aggregate=aggregate_messages_ad
                )
            return jnp.sum(out * out), out

        (val, out), grads = jax.value_and_grad(
            loss, argnums=(0, 1), has_aux=True
        )(bases_ff if featureful else bases_fl, comps)
        return out, grads

    out0, (gb0, gc0) = f(False)
    out1, (gb1, gc1) = f(128)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out0),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gb1), np.asarray(gb0),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gc1), np.asarray(gc0),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("featureful", [False, True])
def test_pair_contract_gemm_exact(featureful, monkeypatch):
    """GEMM-form pair contraction (``spmm._PAIR_CONTRACT_GEMM``) == the
    batched einsum: forward AND gradients, both pair paths (f32
    reassociation tolerances)."""
    import jax

    rng = np.random.default_rng(12)
    n, r, nb, dout = 30, 4, 5, 6
    triples = make_random_triples(rng, 12, r, 90, unique=True)
    bases_fl = jnp.asarray(rng.normal(size=(nb, n, dout)).astype(np.float32))
    din = 7
    x = jnp.asarray(rng.normal(size=(n, din)).astype(np.float32))
    bases_ff = jnp.asarray(
        rng.normal(size=(nb, din, dout)).astype(np.float32)
    )
    comps = jnp.asarray(rng.normal(size=(2 * r, nb)).astype(np.float32))

    es = build_edge_set(triples, n, r, tile_size=8, with_pair_index=True)

    def f(gemm):
        monkeypatch.setattr(spmm, "_PAIR_CONTRACT_GEMM", gemm)

        def loss(b, c):
            if featureful:
                out = spmm.rel_spmm_basis_pairs(es, x, b, c)
            else:
                out = spmm.rel_spmm_featureless_basis(es, b, c)
            return jnp.sum(out * out), out

        (val, out), grads = jax.value_and_grad(
            loss, argnums=(0, 1), has_aux=True
        )(bases_ff if featureful else bases_fl, comps)
        return out, grads

    out0, (gb0, gc0) = f(False)
    out1, (gb1, gc1) = f(True)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out0),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gb1), np.asarray(gb0),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gc1), np.asarray(gc0),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("featureful", [False, True])
def test_pair_dt_layout_backward_exact(featureful, monkeypatch):
    """Scatter-free wide-gather backward (``spmm._PAIR_DT_LAYOUT`` +
    ``SrcRelPairs.src_layout``) == the plain AD scatter-add: forward AND
    gradients, both pair paths (an exact reassociation — f32
    tolerances). The src_layout includes pad pairs at node 0 exactly
    like the scatter it replaces."""
    import jax

    rng = np.random.default_rng(17)
    n, r, nb, dout = 30, 4, 5, 6
    triples = make_random_triples(rng, 12, r, 90, unique=True)
    bases_fl = jnp.asarray(rng.normal(size=(nb, n, dout)).astype(np.float32))
    din = 7
    x = jnp.asarray(rng.normal(size=(n, din)).astype(np.float32))
    bases_ff = jnp.asarray(
        rng.normal(size=(nb, din, dout)).astype(np.float32)
    )
    comps = jnp.asarray(rng.normal(size=(2 * r, nb)).astype(np.float32))

    es = build_edge_set(
        triples, n, r, tile_size=8, with_dst_layout=True,
        with_pair_index=True, with_pair_agg=True,
    )
    assert es.pairs.src_layout is not None

    def f(use_layout):
        monkeypatch.setattr(spmm, "_PAIR_DT_LAYOUT", use_layout)

        def loss(b, c):
            if featureful:
                out = spmm.rel_spmm_basis_pairs(es, x, b, c)
            else:
                out = spmm.rel_spmm_featureless_basis(es, b, c)
            return jnp.sum(out * out), out

        (val, out), grads = jax.value_and_grad(
            loss, argnums=(0, 1), has_aux=True
        )(bases_ff if featureful else bases_fl, comps)
        return out, grads

    out0, (gb0, gc0) = f(False)
    out1, (gb1, gc1) = f(True)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out0),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gb1), np.asarray(gb0),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gc1), np.asarray(gc0),
                               rtol=1e-4, atol=1e-5)
