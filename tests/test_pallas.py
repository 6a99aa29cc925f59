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
