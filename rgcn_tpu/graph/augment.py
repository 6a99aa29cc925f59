"""Triple augmentation: inverse relations and self-loops.

Semantics follow the reference library's graph augmentation
(``/root/reference/torch_rgcn/utils.py:100-141``): a knowledge graph with
``R`` relations is expanded so that

* each triple ``(s, p, o)`` gains an inverse ``(o, p + R, s)``,
* every node ``v`` gains a self-loop ``(v, 2R, v)``,
* self-loops come *last* so positional edge dropout can address them.

Everything here is preprocessing-time NumPy: on TPU the augmented edge list is
built once (or per sampled subgraph inside jit, see
:mod:`rgcn_tpu.graph.dynamic`), never inside a hot loop.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "inverse_triples",
    "self_loop_triples",
    "augment_triples",
    "split_spo",
]


def split_spo(triples):
    """Split a ``(..., 3)`` triple tensor into (subject, predicate, object).

    Works on NumPy or JAX arrays, any batch rank (reference
    ``torch_rgcn/utils.py:201-206`` supported 2-D and 3-D only).
    """
    return triples[..., 0], triples[..., 1], triples[..., 2]


def inverse_triples(triples: np.ndarray, num_rels: int) -> np.ndarray:
    """Return the inverse triple ``(o, p + R, s)`` for each ``(s, p, o)``.

    Mirrors ``generate_inverses`` (reference ``torch_rgcn/utils.py:100-107``).
    """
    triples = np.asarray(triples)
    return np.stack(
        [triples[:, 2], triples[:, 1] + num_rels, triples[:, 0]], axis=1
    )


def self_loop_triples(num_nodes: int, num_rels: int) -> np.ndarray:
    """Return the ``(v, 2R, v)`` self-loop triple for every node.

    Mirrors the self-loop construction of ``generate_self_loops``
    (reference ``torch_rgcn/utils.py:110-124``) *without* the Bernoulli
    keep-mask: on TPU self-loop dropout is a multiplicative mask applied at
    compute time (static shapes), never a physical removal.
    """
    v = np.arange(num_nodes, dtype=np.int64)
    p = np.full(num_nodes, 2 * num_rels, dtype=np.int64)
    return np.stack([v, p, v], axis=1)


def augment_triples(
    triples: np.ndarray, num_nodes: int, num_rels: int
) -> np.ndarray:
    """Concatenate ``originals || inverses || self-loops``.

    Mirrors ``add_inverse_and_self`` (reference ``torch_rgcn/utils.py:127-141``)
    including the ordering contract (self-loops appended last).
    """
    triples = np.asarray(triples, dtype=np.int64)
    return np.concatenate(
        [
            triples,
            inverse_triples(triples, num_rels),
            self_loop_triples(num_nodes, num_rels),
        ],
        axis=0,
    )
