"""The in-jit EdgeSet builder must agree with the NumPy preprocessing path,
and its dropout masking must reproduce remove-the-edge semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from rgcn_tpu.graph.dynamic import build_edge_set_dynamic, self_loop_keep_mask
from rgcn_tpu.graph.structure import build_edge_set
from rgcn_tpu.ops.spmm import rel_spmm
from tests.conftest import make_random_triples


def _spmm_out(es, x, w):
    return np.asarray(rel_spmm(es, jnp.asarray(x), jnp.asarray(w)))


def test_dynamic_matches_static():
    rng = np.random.default_rng(40)
    n, r, din, dout = 30, 4, 6, 5
    triples = make_random_triples(rng, n, r, 80)
    x = rng.normal(size=(n, din)).astype(np.float32)
    w = rng.normal(size=(2 * r, din, dout)).astype(np.float32)

    es_np = build_edge_set(triples, n, r, tile_size=8)
    es_dyn = jax.jit(
        lambda t: build_edge_set_dynamic(t, n, r, tile_size=8)
    )(jnp.asarray(triples))

    np.testing.assert_allclose(
        _spmm_out(es_dyn, x, w), _spmm_out(es_np, x, w), rtol=1e-4, atol=1e-5
    )


def test_dynamic_tile_multiple_invariant():
    rng = np.random.default_rng(41)
    n, r, din, dout = 25, 3, 4, 4
    triples = make_random_triples(rng, n, r, 50)
    x = rng.normal(size=(n, din)).astype(np.float32)
    w = rng.normal(size=(2 * r, din, dout)).astype(np.float32)

    a = build_edge_set_dynamic(jnp.asarray(triples), n, r, tile_size=8)
    b = build_edge_set_dynamic(
        jnp.asarray(triples), n, r, tile_size=8, tile_multiple=8
    )
    assert b.num_tiles % 8 == 0
    np.testing.assert_allclose(
        _spmm_out(a, x, w), _spmm_out(b, x, w), rtol=1e-5, atol=1e-6
    )


def test_dropout_mask_equals_edge_removal():
    """Masked edges must be exactly equivalent to physically removing the
    triples before building the graph (the reference's drop-then-normalize
    order, ``experiments/predict_links.py:143-148`` →
    ``torch_rgcn/layers.py:504-510``)."""
    rng = np.random.default_rng(42)
    n, r, din, dout = 30, 3, 5, 4
    triples = make_random_triples(rng, n, r, 60)
    x = rng.normal(size=(n, din)).astype(np.float32)
    w = rng.normal(size=(2 * r, din, dout)).astype(np.float32)

    key = jax.random.key(5)
    es_masked = build_edge_set_dynamic(
        jnp.asarray(triples), n, r, tile_size=8,
        dropout_rate=0.5, dropout_key=key,
    )
    # reconstruct which originals were kept, then build statically from them
    keep = np.asarray(
        jax.random.bernoulli(key, 0.5, (len(triples),))
    )
    kept = triples[keep]
    es_removed = build_edge_set(kept, n, r, tile_size=8)

    np.testing.assert_allclose(
        _spmm_out(es_masked, x, w),
        _spmm_out(es_removed, x, w),
        rtol=1e-4,
        atol=1e-5,
    )


def test_self_loop_keep_mask():
    m = self_loop_keep_mask(None, 5, 0.3)
    np.testing.assert_array_equal(np.asarray(m), np.ones((5, 1)))
    m2 = self_loop_keep_mask(jax.random.key(0), 1000, 0.7)
    frac = float(np.asarray(m2).mean())
    assert 0.6 < frac < 0.8


def test_host_builder_matches_traced_builder():
    """build_edge_set_dynamic_host (the background-thread epoch builder)
    must be BIT-identical to the in-jit builder — EdgeSet fields, both
    destination layouts, and the reversed structure — including under
    dropout (shared keep mask)."""
    import numpy as np

    from rgcn_tpu.graph.dynamic import (
        build_edge_set_dynamic,
        build_edge_set_dynamic_host,
    )
    from tests.conftest import make_random_triples

    rng = np.random.default_rng(33)
    n, r, bsz, tile, rb = 64, 5, 100, 16, 8
    positives = make_random_triples(rng, n, r, bsz)
    keep = (rng.random(bsz) < 0.6).astype(np.float32)

    es_t = build_edge_set_dynamic(
        jnp.asarray(positives), n, r, tile_size=tile,
        dropout_rate=0.5, keep_mask=jnp.asarray(keep),
        with_dst_layout=True, row_block=rb,
    )
    es_h = build_edge_set_dynamic_host(
        positives, n, r, tile_size=tile,
        dropout_rate=0.5, keep_mask=keep,
        with_dst_layout=True, row_block=rb, layout_chunk=tile,
    )

    def cmp(a, b, what):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=what
        )

    for field in ("src", "dst", "rel", "val", "tile_rel"):
        cmp(getattr(es_t, field), getattr(es_h, field), field)
    for field in ("perm", "local_dst", "chunk_block"):
        cmp(getattr(es_t.layout, field), getattr(es_h.layout, field),
            f"layout.{field}")
    for field in ("src", "dst", "rel", "val", "tile_rel"):
        cmp(getattr(es_t.reverse, field), getattr(es_h.reverse, field),
            f"reverse.{field}")
    for field in ("perm", "local_dst", "chunk_block"):
        cmp(getattr(es_t.reverse.layout, field),
            getattr(es_h.reverse.layout, field), f"reverse.layout.{field}")


def test_auto_layout_row_block():
    """Row-block escalation: small subgraphs over large node sets escalate
    (WN18 per-epoch: 60k edges / 40.9k nodes -> 512, the swept production
    optimum); edge-dominant graphs stay at 128; mega-node graphs ride the
    2048 cap (1M nodes / 200k edges: rb=512's 250k-slot block-minimum pad
    floor drops to ~63k — measured 184.6 -> 163.7 ms/step,
    benchmarks/probe_stress_step.py)."""
    from rgcn_tpu.graph.dynamic import auto_layout_row_block

    assert auto_layout_row_block(40_943, 60_000) == 512
    assert auto_layout_row_block(1_000_000, 200_000) == 2048
    assert auto_layout_row_block(40_943, 600_000) == 128
    # pad floor monotonically shrinks with rb; result always a power of
    # two in [128, 2048]
    for n, e in ((100, 10), (10_000, 10_000), (500_000, 5_000_000)):
        rb = auto_layout_row_block(n, e)
        assert rb in (128, 256, 512, 1024, 2048)
