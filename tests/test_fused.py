"""Fused single-pass SpMM kernel (v2): layout invariants + numeric parity."""

import jax.numpy as jnp
import numpy as np

from rgcn_tpu.graph.structure import build_edge_set
from rgcn_tpu.ops.pallas_fused import build_fused_layout, rel_spmm_fused
from rgcn_tpu.ops.spmm import rel_spmm
from tests.conftest import make_random_triples


def _setup(seed, n=70, r=5, e=300, din=16, dout=12):
    rng = np.random.default_rng(seed)
    t = make_random_triples(rng, n, r, e)
    es = build_edge_set(t, n, r, tile_size=16)
    x = jnp.asarray(rng.normal(size=(n, din)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(2 * r, din, dout)).astype(np.float32))
    return es, x, w, n


def test_fused_layout_invariants():
    es, _, _, n = _setup(80)
    fl = build_fused_layout(es, row_block=16, chunk=16, quantum=8)
    assert fl.src.shape == fl.val.shape
    assert fl.src.shape[0] == fl.num_chunks * fl.chunk
    # edge mass preserved: sum of vals equals the EdgeSet's
    np.testing.assert_allclose(fl.val.sum(), np.asarray(es.val).sum(), rtol=1e-5)
    # each quantum is relation-pure: verified implicitly by numeric parity,
    # and pads carry zero val
    pad = fl.val == 0
    assert (fl.local_dst.reshape(-1)[pad] == fl.row_block).all()
    # chunk_block is non-decreasing (write-once output blocks)
    assert (np.diff(fl.chunk_block) >= 0).all()


def test_fused_matches_xla_f32():
    es, x, w, n = _setup(81)
    want = np.asarray(rel_spmm(es, x, w))
    fl = build_fused_layout(es, row_block=16, chunk=16, quantum=8)
    got = np.asarray(
        rel_spmm_fused(fl, n, x, w, compute_dtype=None, interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_fused_bf16_close():
    es, x, w, n = _setup(82)
    want = np.asarray(rel_spmm(es, x, w))
    fl = build_fused_layout(es, row_block=16, chunk=16, quantum=8)
    got = np.asarray(rel_spmm_fused(fl, n, x, w, interpret=True))
    # bf16 inputs + bf16 message buffer: ~1% mean relative error
    err = np.abs(got - want) / (np.abs(want) + 1e-2)
    assert err.mean() < 0.05
