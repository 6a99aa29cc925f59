"""Reference-compatible L1 primitives (NumPy), for tooling and golden tests.

The production path never materializes stacked adjacencies or block-diagonal
matrices — see :mod:`rgcn_tpu.graph.structure` / :mod:`rgcn_tpu.ops.spmm` —
but the reference's L1 surface (``/root/reference/torch_rgcn/utils.py``) is
part of its behavioral contract and its exact-value tests
(``tests/test_utils.py``) are ported against these functions:

* :func:`stack_matrices` — COO indices of the vertically / horizontally
  stacked typed adjacency (``utils.py:143-166``);
* :func:`sum_sparse` — row- (or transposed column-) sums broadcast back to
  the nnz entries (``utils.py:71-97``);
* :func:`block_diag` — expand ``(..., B, i, o)`` block tensors into dense
  block-diagonal matrices (``utils.py:168-196``);
* :func:`drop_edges` — physical edge dropout with positionally-addressed
  self-loops (``utils.py:57-69``); production code uses value masks instead.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

__all__ = ["stack_matrices", "sum_sparse", "block_diag", "drop_edges"]


def stack_matrices(
    triples: np.ndarray,
    num_nodes: int,
    num_rels: int,
    vertical_stacking: bool = True,
) -> Tuple[np.ndarray, Tuple[int, int]]:
    """COO indices + shape of the stacked typed adjacency.

    Vertical: entry at ``(p * N + s, o)`` in an ``(R·N, N)`` matrix.
    Horizontal: entry at ``(s, p * N + o)`` in an ``(N, R·N)`` matrix.
    """
    triples = np.asarray(triples)
    n, r = num_nodes, num_rels
    s, p, o = triples[:, 0], triples[:, 1], triples[:, 2]
    if vertical_stacking:
        rows, cols = p * n + s, o
        size = (r * n, n)
    else:
        rows, cols = s, p * n + o
        size = (n, r * n)
    return np.stack([rows, cols], axis=1), size


def sum_sparse(
    indices: np.ndarray,
    values: np.ndarray,
    size: Tuple[int, int],
    row_normalisation: bool = True,
) -> np.ndarray:
    """Per-entry row sums (or column sums via the transpose trick).

    Returns, for each nnz entry, the sum of all values sharing its row
    (``row_normalisation=True``) or its column — the divisor used for degree
    normalization. Matches ``sum_sparse`` including the transpose-trick
    index order that motivates the reference's reorder step.
    """
    indices = np.asarray(indices)
    values = np.asarray(values, dtype=np.float64)
    if not row_normalisation:
        indices = indices[:, ::-1]
        size = (size[1], size[0])
    sums = np.zeros(size[0], dtype=np.float64)
    np.add.at(sums, indices[:, 0], values)
    return sums[indices[:, 0]].astype(np.float32)


def block_diag(blocks: np.ndarray) -> np.ndarray:
    """Expand ``(..., B, i, o)`` into ``(..., B·i, B·o)`` block-diagonals."""
    blocks = np.asarray(blocks)
    *lead, nb, bi, bo = blocks.shape
    out = np.zeros((*lead, nb * bi, nb * bo), dtype=blocks.dtype)
    for b in range(nb):
        out[..., b * bi : (b + 1) * bi, b * bo : (b + 1) * bo] = blocks[
            ..., b, :, :
        ]
    return out


def drop_edges(
    triples: np.ndarray,
    num_nodes: int,
    general_dropout: float,
    self_loop_dropout: float,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """Physically remove edges (reference semantics; self-loops are the last
    ``num_nodes`` rows, per the ``add_inverse_and_self`` ordering contract).

    Keeps ``floor(keep_rate * count)`` uniformly-chosen rows per group.
    """
    rng = rng or np.random.default_rng()
    triples = np.asarray(triples)
    nt = len(triples) - num_nodes
    n_keep_general = int(np.floor((1.0 - general_dropout) * nt))
    n_keep_self = int(np.floor((1.0 - self_loop_dropout) * num_nodes))
    general = rng.choice(nt, n_keep_general, replace=False)
    self_loops = nt + rng.choice(num_nodes, n_keep_self, replace=False)
    return triples[np.concatenate([general, self_loops])]
