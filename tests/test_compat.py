"""Golden tests of the L1 compat primitives — the exact-value behavioral
contract of the reference's ``tests/test_utils.py`` (stacking indices,
normalization sums, dropout keep-counts, horizontal reorder), asserted both
on hand-built cases and directly against the live reference functions.
"""

import sys

import numpy as np
import pytest

from rgcn_tpu.graph.augment import augment_triples
from rgcn_tpu.graph.compat import (
    block_diag,
    drop_edges,
    stack_matrices,
    sum_sparse,
)

# 4-node / 3-relation toy graph in the shape the reference tests use:
# originals, inverses, then self-loops (relation ids 0, 1=inverse, 2=self).
TOY = np.array(
    [
        [0, 0, 1],
        [1, 0, 2],
        [2, 0, 3],
        [1, 1, 0],
        [2, 1, 1],
        [3, 1, 2],
        [0, 2, 0],
        [1, 2, 1],
        [2, 2, 2],
        [3, 2, 3],
    ]
)


def test_stack_matrices_vertical_exact():
    idx, size = stack_matrices(TOY, 4, 3, vertical_stacking=True)
    assert size == (12, 4)
    np.testing.assert_array_equal(idx[:, 0], TOY[:, 1] * 4 + TOY[:, 0])
    np.testing.assert_array_equal(idx[:, 1], TOY[:, 2])
    assert idx[:, 0].max() < 12 and idx[:, 1].max() < 4


def test_stack_matrices_horizontal_exact():
    idx, size = stack_matrices(TOY, 4, 3, vertical_stacking=False)
    assert size == (4, 12)
    np.testing.assert_array_equal(idx[:, 0], TOY[:, 0])
    np.testing.assert_array_equal(idx[:, 1], TOY[:, 1] * 4 + TOY[:, 2])


def test_sum_sparse_row_normalisation():
    idx, size = stack_matrices(TOY, 4, 3, vertical_stacking=True)
    vals = np.ones(len(TOY), dtype=np.float32)
    sums = sum_sparse(idx, vals, size, row_normalisation=True)
    # every (s, p) pair in TOY is unique -> every row sum is 1
    np.testing.assert_allclose(sums, np.ones(len(TOY)))

    dup = np.concatenate([TOY, TOY[:1]], axis=0)  # duplicate first edge
    idx, size = stack_matrices(dup, 4, 3, vertical_stacking=True)
    sums = sum_sparse(idx, np.ones(len(dup)), size, row_normalisation=True)
    assert sums[0] == 2.0 and sums[-1] == 2.0
    np.testing.assert_allclose(sums[1:-1], np.ones(len(dup) - 2))


def test_sum_sparse_column_normalisation_with_reorder():
    """The horizontal-stacking normalization dance: column sums come back in
    transposed order; after the reference's reorder
    (``layers.py:267-273``) every edge is divided by its subject's
    out-degree under its relation — identical to the vertical row sums."""
    rng = np.random.default_rng(0)
    triples = np.stack(
        [rng.integers(0, 6, 30), rng.integers(0, 2, 30), rng.integers(0, 6, 30)],
        axis=1,
    )
    aug = augment_triples(triples, 6, 2)
    n = len(triples)
    i = 6  # self-loop count

    idx_h, size_h = stack_matrices(aug, 6, 5, vertical_stacking=False)
    sums_h = sum_sparse(idx_h, np.ones(len(aug)), size_h, row_normalisation=False)
    reordered = np.concatenate([sums_h[n : 2 * n], sums_h[:n], sums_h[-i:]])

    idx_v, size_v = stack_matrices(aug, 6, 5, vertical_stacking=True)
    sums_v = sum_sparse(idx_v, np.ones(len(aug)), size_v, row_normalisation=True)

    np.testing.assert_allclose(reordered, sums_v)


def test_block_diag_exact():
    blocks = np.ones((4, 3, 2), dtype=np.float32)
    out = block_diag(blocks)
    assert out.shape == (12, 8)
    assert out.sum() == 4 * 3 * 2
    assert out[0, 0] == 1 and out[0, 2] == 0 and out[3, 2] == 1


def test_drop_edges_keep_counts():
    aug = augment_triples(TOY[:3], 4, 3)  # 3 + 3 + 4 rows
    rng = np.random.default_rng(1)
    kept = drop_edges(aug, 4, general_dropout=0.5, self_loop_dropout=0.25, rng=rng)
    # floor(0.5 * 6) general + floor(0.75 * 4) self-loops
    assert len(kept) == 3 + 3


def test_against_live_reference():
    torch = pytest.importorskip("torch")
    if "/root/reference" not in sys.path:
        sys.path.append("/root/reference")
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        from torch_rgcn import utils as ref_utils

    rng = np.random.default_rng(2)
    triples = np.stack(
        [rng.integers(0, 8, 40), rng.integers(0, 3, 40), rng.integers(0, 8, 40)],
        axis=1,
    )
    aug = augment_triples(triples, 8, 3)
    t = torch.tensor(aug, dtype=torch.long)

    for vertical in (True, False):
        ref_idx, ref_size = ref_utils.stack_matrices(
            t, 8, 7, vertical_stacking=vertical
        )
        idx, size = stack_matrices(aug, 8, 7, vertical_stacking=vertical)
        np.testing.assert_array_equal(idx, ref_idx.numpy())
        assert tuple(size) == tuple(ref_size)

        vals = torch.ones(len(aug))
        ref_sums = ref_utils.sum_sparse(
            ref_idx, vals, ref_size, row_normalisation=vertical
        )
        sums = sum_sparse(idx, np.ones(len(aug)), size, row_normalisation=vertical)
        np.testing.assert_allclose(sums, ref_sums.numpy(), rtol=1e-6)

    blocks = rng.normal(size=(5, 2, 3, 4)).astype(np.float32)
    np.testing.assert_allclose(
        block_diag(blocks),
        ref_utils.block_diag(torch.tensor(blocks)).numpy(),
        rtol=1e-6,
    )

    ref_aug = ref_utils.add_inverse_and_self(
        torch.tensor(triples, dtype=torch.long), 8, 3
    )
    np.testing.assert_array_equal(aug, ref_aug.numpy())
