"""Golden tests for graph augmentation, normalization and EdgeSet layout.

These encode the behavioral contract of the reference's L1 primitives
(``/root/reference/torch_rgcn/utils.py``: ``add_inverse_and_self``,
``stack_matrices``, ``sum_sparse``) — the exact-value tests the reference
ships in ``tests/test_utils.py`` — plus invariants of the TPU-native
relation-sorted tile layout that replaces them.
"""

import numpy as np
import pytest

from rgcn_tpu.graph.augment import (
    augment_triples,
    inverse_triples,
    self_loop_triples,
)
from rgcn_tpu.graph.structure import build_edge_set, edge_normalization
from tests.conftest import make_random_triples


def test_augment_exact():
    """originals || inverses || self-loops, with exact ids (utils.py:127-141)."""
    triples = np.array([[0, 0, 1], [1, 1, 2]])
    out = augment_triples(triples, num_nodes=3, num_rels=2)
    expected = np.array(
        [
            [0, 0, 1],
            [1, 1, 2],
            [1, 2, 0],  # inverse: (o, p + R, s)
            [2, 3, 1],
            [0, 4, 0],  # self-loops last, relation 2R
            [1, 4, 1],
            [2, 4, 2],
        ]
    )
    np.testing.assert_array_equal(out, expected)


def test_inverse_and_self_shapes():
    t = np.array([[0, 0, 1], [2, 1, 0], [1, 0, 2]])
    inv = inverse_triples(t, 2)
    np.testing.assert_array_equal(inv[:, 1], t[:, 1] + 2)
    np.testing.assert_array_equal(inv[:, 0], t[:, 2])
    np.testing.assert_array_equal(inv[:, 2], t[:, 0])
    sl = self_loop_triples(4, 2)
    assert sl.shape == (4, 3)
    np.testing.assert_array_equal(sl[:, 0], sl[:, 2])
    assert (sl[:, 1] == 4).all()


def test_edge_normalization_exact():
    """1/deg per (rel, dst): node 0 has two rel-0 edges → 0.5 each."""
    rel = np.array([0, 0, 1, 0])
    dst = np.array([0, 0, 0, 1])
    val = edge_normalization(rel, dst, num_nodes=3)
    np.testing.assert_allclose(val, [0.5, 0.5, 1.0, 1.0])


def test_edge_normalization_masked():
    """Dropped edges get 0 and do not count toward the group degree."""
    rel = np.array([0, 0, 0])
    dst = np.array([0, 0, 0])
    mask = np.array([1.0, 0.0, 1.0])
    val = edge_normalization(rel, dst, num_nodes=2, mask=mask)
    np.testing.assert_allclose(val, [0.5, 0.0, 0.5])


def test_normalization_matches_reference_sum_sparse():
    """Parity with the reference's sum_sparse + reorder dance.

    The reference computes, for the *vertically stacked* adjacency, the row
    sum of row ``p*N + s`` and divides each edge by it
    (``torch_rgcn/layers.py:263-273``). Horizontal stacking plus the reorder
    yields the same per-edge value (verified against the live reference in
    test_reference_parity.py). Here: oracle by direct counting.
    """
    rng = np.random.default_rng(1)
    triples = make_random_triples(rng, 20, 4, 60)
    aug = np.concatenate([triples, inverse_triples(triples, 4)], axis=0)
    dst, rel = aug[:, 0], aug[:, 1]
    val = edge_normalization(rel, dst, num_nodes=20)
    from collections import Counter

    deg = Counter(zip(rel.tolist(), dst.tolist()))
    expected = np.array([1.0 / deg[(p, s)] for p, s in zip(rel, dst)])
    np.testing.assert_allclose(val, expected, rtol=1e-6)


@pytest.mark.parametrize("tile_size", [4, 32, 128])
def test_edge_set_invariants(tile_size):
    rng = np.random.default_rng(2)
    num_nodes, num_rels = 30, 5
    triples = make_random_triples(rng, num_nodes, num_rels, 100)
    es = build_edge_set(triples, num_nodes, num_rels, tile_size=tile_size)

    assert es.num_rels == 2 * num_rels
    assert es.src.shape[0] == es.num_tiles * tile_size
    assert es.num_edges == 2 * len(triples)
    # real edge mass: every kept edge's val > 0, pads are exactly 0
    assert int((es.val > 0).sum()) == es.num_edges
    # relation-uniform tiles
    rel_tiles = es.rel.reshape(es.num_tiles, tile_size)
    assert (rel_tiles == rel_tiles[:, :1]).all()
    np.testing.assert_array_equal(rel_tiles[:, 0], es.tile_rel)
    # pads target the dummy row
    pad = es.val == 0
    assert (es.dst[pad] == num_nodes).all()
    # per-(rel,dst) group values sum to exactly 1 for each non-empty group
    key = es.rel.astype(np.int64) * (num_nodes + 1) + es.dst
    sums = {}
    for k, v in zip(key, es.val):
        sums[k] = sums.get(k, 0.0) + v
    for k, v in sums.items():
        if k % (num_nodes + 1) != num_nodes:  # skip pad rows
            assert abs(v - 1.0) < 1e-5


def test_edge_set_preserves_duplicates():
    """Duplicate (s,p,o) triples both count toward the degree, as in the
    reference's sparse-tensor sum (duplicate COO entries accumulate)."""
    triples = np.array([[0, 0, 1], [0, 0, 1]])
    es = build_edge_set(triples, 2, 1, tile_size=4, add_inverses=False)
    real = es.val[es.val > 0]
    np.testing.assert_allclose(real, [0.5, 0.5])


def test_layout_geometry_plumbed_through_builders():
    """layout_row_block/layout_chunk must reach BOTH the forward and
    reverse dst layouts, in the native and NumPy builder paths alike."""
    import numpy as np

    from rgcn_tpu.graph.structure import auto_nc_row_block, build_edge_set
    from tests.conftest import make_random_triples

    rng = np.random.default_rng(5)
    triples = make_random_triples(rng, 30, 3, 100)
    for prefer_native in (False, True):
        es = build_edge_set(
            triples, 30, 3, tile_size=8, with_dst_layout=True,
            prefer_native=prefer_native,
            layout_row_block=16, layout_chunk=32,
        )
        assert es.layout.row_block == 16 and es.layout.chunk == 32
        assert es.reverse.layout.row_block == 16
        assert es.reverse.layout.chunk == 32

    # the NC policy: small graphs keep the swept 128 default; block count
    # bounded at ~640 for large node sets, capped at 2048
    assert auto_nc_row_block(8_285) == 128      # AIFB
    assert auto_nc_row_block(40_943) == 128     # WN18-size
    assert auto_nc_row_block(300_000) == 512    # AM
    assert auto_nc_row_block(10_000_000) == 2048


def test_src_rel_pairs_order_variants_equivalent():
    """order="src" (streaming wide-table gathers) and order="rel" carry
    the same pair set and produce identical SpMM results."""
    import jax.numpy as jnp

    from rgcn_tpu.graph.structure import build_edge_set, build_src_rel_pairs
    from rgcn_tpu.ops import spmm
    from tests.conftest import make_random_triples

    rng = np.random.default_rng(21)
    triples = make_random_triples(rng, 12, 4, 90, unique=True)
    es = build_edge_set(triples, 30, 4, tile_size=8)
    import dataclasses as _dc

    p_rel = build_src_rel_pairs(es, order="rel")
    p_src = build_src_rel_pairs(es, order="src")
    assert p_rel.num_pairs == p_src.num_pairs
    # src-order: pair_src ascending (ties broken by rel)
    real = p_src.num_pairs
    key = p_src.pair_src[:real] * (es.num_rels + 1) + p_src.pair_rel[:real]
    assert np.all(np.diff(key) > 0)
    # same (src, rel) multiset
    k_rel = np.sort(
        p_rel.pair_src[:real] * (es.num_rels + 1) + p_rel.pair_rel[:real]
    )
    np.testing.assert_array_equal(np.sort(key), k_rel)

    bases = jnp.asarray(rng.normal(size=(5, 30, 6)).astype(np.float32))
    comps = jnp.asarray(rng.normal(size=(8, 5)).astype(np.float32))
    out_rel = spmm.rel_spmm_featureless_basis(
        _dc.replace(es, pairs=p_rel), bases, comps
    )
    out_src = spmm.rel_spmm_featureless_basis(
        _dc.replace(es, pairs=p_src), bases, comps
    )
    np.testing.assert_allclose(
        np.asarray(out_src), np.asarray(out_rel), rtol=1e-5, atol=1e-6
    )
