"""Pallas kernel parity (interpreter mode on CPU; compiled path is exercised
by bench.py on real TPU hardware)."""

import jax.numpy as jnp
import numpy as np
import pytest

from rgcn_tpu.graph.structure import build_edge_set
from rgcn_tpu.ops.pallas_spmm import rel_spmm_pallas
from rgcn_tpu.ops.spmm import rel_spmm
from tests.conftest import make_random_triples


@pytest.mark.parametrize("tile_size", [8, 16])
def test_pallas_spmm_matches_xla(tile_size):
    rng = np.random.default_rng(50)
    n, r, din, dout = 40, 5, 16, 8
    triples = make_random_triples(rng, n, r, 150)
    es = build_edge_set(triples, n, r, tile_size=tile_size)
    x = jnp.asarray(rng.normal(size=(n, din)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(2 * r, din, dout)).astype(np.float32))

    want = np.asarray(rel_spmm(es, x, w))
    got = np.asarray(rel_spmm_pallas(es, x, w, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_pallas_full_pipeline_matches_xla():
    """Message kernel + destination-layout MXU aggregation == XLA path."""
    from rgcn_tpu.ops.pallas_spmm import rel_spmm_pallas_full

    rng = np.random.default_rng(52)
    n, r, din, dout = 60, 4, 16, 8
    triples = make_random_triples(rng, n, r, 250)
    es = build_edge_set(triples, n, r, tile_size=16, with_dst_layout=True)
    x = jnp.asarray(rng.normal(size=(n, din)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(2 * r, din, dout)).astype(np.float32))

    want = np.asarray(rel_spmm(es, x, w))
    got = np.asarray(rel_spmm_pallas_full(es, es.layout, x, w, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_pallas_ad_matches_xla_grads():
    """Custom VJP (reversed-edge SpMM for dx, tile outer products for dW)
    == XLA autodiff of the reference path."""
    import jax

    from rgcn_tpu.ops.pallas_spmm import rel_spmm_pallas_ad

    rng = np.random.default_rng(53)
    n, r, d = 40, 3, 8
    triples = make_random_triples(rng, n, r, 150)
    es = build_edge_set(triples, n, r, tile_size=8, with_dst_layout=True)
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(2 * r, d, d)).astype(np.float32))
    tgt = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))

    def loss_pallas(x, w):
        return jnp.sum((rel_spmm_pallas_ad(es, x, w) - tgt) ** 2)

    def loss_xla(x, w):
        return jnp.sum((rel_spmm(es, x, w) - tgt) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1))(x, w)
    gx = jax.grad(loss_xla, argnums=(0, 1))(x, w)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4
        )


def test_layer_pallas_backend_matches_xla():
    """RGCNConv with backend='pallas' (interpret on CPU) == backend='xla'."""
    import jax

    from rgcn_tpu.nn.layers import RGCNConv

    rng = np.random.default_rng(54)
    n, r, din, dout = 30, 3, 8, 8
    triples = make_random_triples(rng, n, r, 100)
    es = build_edge_set(triples, n, r, tile_size=8, with_dst_layout=True)
    x = jnp.asarray(rng.normal(size=(n, din)).astype(np.float32))

    kwargs = dict(
        num_nodes=n, num_relations=2 * r + 1,
        in_features=din, out_features=dout,
    )
    m_x = RGCNConv(backend="xla", **kwargs)
    m_p = RGCNConv(backend="pallas", **kwargs)
    params = m_x.init(jax.random.key(0), es, x)
    np.testing.assert_allclose(
        np.asarray(m_p.apply(params, es, x)),
        np.asarray(m_x.apply(params, es, x)),
        rtol=1e-4,
        atol=1e-5,
    )


def test_dynamic_layout_pallas_matches_xla():
    """In-jit layout + reverse (LP training path) == XLA, incl. gradients."""
    import jax

    from rgcn_tpu.graph.dynamic import build_edge_set_dynamic
    from rgcn_tpu.ops.pallas_spmm import rel_spmm_pallas_ad

    rng = np.random.default_rng(55)
    n, r, d = 40, 3, 8
    triples = make_random_triples(rng, n, r, 120)
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(2 * r, d, d)).astype(np.float32))
    tgt = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))

    es = jax.jit(
        lambda t: build_edge_set_dynamic(
            t, n, r, tile_size=8, with_dst_layout=True, row_block=8
        )
    )(jnp.asarray(triples))

    want = np.asarray(rel_spmm(es, x, w))
    got = np.asarray(rel_spmm_pallas_ad(es, x, w))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def loss_p(x, w):
        return jnp.sum((rel_spmm_pallas_ad(es, x, w) - tgt) ** 2)

    def loss_x(x, w):
        return jnp.sum((rel_spmm(es, x, w) - tgt) ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1))(x, w)
    gx = jax.grad(loss_x, argnums=(0, 1))(x, w)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4
        )


def test_pallas_spmm_bf16_close():
    rng = np.random.default_rng(51)
    n, r, d = 32, 3, 16
    triples = make_random_triples(rng, n, r, 100)
    es = build_edge_set(triples, n, r, tile_size=8)
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(2 * r, d, d)).astype(np.float32))

    want = np.asarray(rel_spmm(es, x, w))
    got = np.asarray(
        rel_spmm_pallas(es, x, w, compute_dtype=jnp.bfloat16, interpret=True)
    )
    # bf16 inputs, f32 accumulation: ~2-3 decimal digits
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-2)
