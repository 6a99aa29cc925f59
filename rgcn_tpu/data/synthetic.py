"""Deterministic synthetic knowledge graphs for tests and benchmarks.

The container has no network egress and ships no datasets, so real data
(loaded via :mod:`rgcn_tpu.data.loaders` when present under ``data/``) is
replaced by generators that match the *statistics* that matter for both
benchmarking (node/relation/edge counts, skewed degree and relation
distributions) and smoke-training (a planted class/link structure so
accuracy and MRR measurably improve).

``wn18_like`` reproduces WN18's published scale (40,943 entities,
18 relations, 141,442 train triples) so the north-star edges/s/chip metric
is measured on a realistically-shaped workload.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Set, Tuple

import numpy as np

from rgcn_tpu.data.loaders import LinkPredictionData, NodeClassificationData

__all__ = [
    "synthetic_kg",
    "synthetic_node_classification",
    "synthetic_link_prediction",
    "wn18_like",
    "fb_toy_like",
    "aifb_like",
]


def synthetic_kg(
    num_nodes: int,
    num_rels: int,
    num_edges: int,
    seed: int = 0,
    zipf_nodes: float = 1.1,
    zipf_rels: float = 1.2,
    reciprocity: float = 0.0,
) -> np.ndarray:
    """Random KG with Zipf-skewed node degrees and relation frequencies.

    Real knowledge graphs have heavy-tailed degree and relation
    distributions; uniform sampling would understate gather/scatter
    irregularity and overstate kernel throughput.

    ``reciprocity``: fraction of triples whose reciprocal counterpart
    ``(o, partner(p), s)`` is also present, with relations organized as
    inverse pairs ``(2k, 2k+1)``. Real KGs store both directions of their
    hierarchy relations — WN18 famously so (hyponym/hypernym,
    meronym/holonym, symmetric ``_similar_to``/``_verb_group``; ~94% of
    its test triples have the inverse in train — Toutanova & Chen 2015,
    Dettmers et al. 2018). Reciprocity controls how many duplicate
    ``(subject, object)`` pairs inverse augmentation creates, which the
    coalesced basis path (:mod:`rgcn_tpu.graph.coalesce`) exploits; 0
    keeps the structure-free generator (the worst case for coalescing).
    The returned triple count stays ~``num_edges``.
    """
    rng = np.random.default_rng(seed)

    def zipf_choice(n, size, a):
        w = 1.0 / np.arange(1, n + 1) ** a
        w /= w.sum()
        perm = rng.permutation(n)  # decouple id order from popularity
        return perm[rng.choice(n, size=size, p=w)]

    n_base = int(round(num_edges / (1.0 + max(reciprocity, 0.0))))
    s = zipf_choice(num_nodes, n_base, zipf_nodes)
    o = zipf_choice(num_nodes, n_base, zipf_nodes)
    p = zipf_choice(num_rels, n_base, zipf_rels)
    triples = np.stack([s, p, o], axis=1).astype(np.int64)
    if reciprocity > 0.0:
        flip = rng.random(n_base) < reciprocity
        partner = triples[flip][:, [2, 1, 0]].copy()
        # inverse-pair the relation vocabulary: 2k <-> 2k+1 (an odd
        # trailing relation pairs with itself, i.e. is symmetric)
        pr = partner[:, 1]
        partner[:, 1] = np.where(
            (pr ^ 1) < num_rels, pr ^ 1, pr
        )
        triples = np.concatenate([triples, partner], axis=0)
    triples = np.unique(triples, axis=0)
    rng.shuffle(triples)
    return triples


def synthetic_node_classification(
    num_nodes: int = 500,
    num_rels: int = 8,
    num_edges: int = 3000,
    num_classes: int = 4,
    labeled_frac: float = 0.3,
    signal: float = 0.85,
    seed: int = 0,
) -> NodeClassificationData:
    """KG with planted relation-typed class structure.

    With probability ``signal`` an edge ``(s, p, o)`` satisfies
    ``class(o) == (class(s) + p) mod C`` — each relation encodes a fixed
    class-to-class mapping, exactly the inductive bias a typed
    message-passing classifier exploits (class is inferable from the typed
    neighborhood even for unlabeled nodes). Remaining edges are uniform
    noise.
    """
    rng = np.random.default_rng(seed)
    classes = rng.integers(0, num_classes, num_nodes)

    # Attribute-hub structure, mirroring real RDF classification graphs
    # (e.g. AIFB persons → affiliation resources): per class, a few hub
    # nodes; entities link to their class's hubs through typed relations.
    # A featureless R-GCN learns the hubs' evidence from labeled nodes and
    # classifies unlabeled nodes through the shared hubs (1-hop paths).
    hubs_per_class = max(1, min(3, num_rels // 2))
    hub = {}
    for c in range(num_classes):
        for k in range(hubs_per_class):
            hub[(c, k)] = rng.integers(0, num_nodes)

    rows = []
    for v in range(num_nodes):
        for k in range(hubs_per_class):
            if rng.random() < signal:
                target_class = classes[v]
            else:
                target_class = rng.integers(0, num_classes)
            rows.append((v, k % num_rels, hub[(target_class, k)]))

    # background noise edges up to the requested edge budget
    n_noise = max(0, num_edges - len(rows))
    noise = np.stack(
        [
            rng.integers(0, num_nodes, n_noise),
            rng.integers(0, num_rels, n_noise),
            rng.integers(0, num_nodes, n_noise),
        ],
        axis=1,
    )
    triples = np.concatenate([np.asarray(rows, dtype=np.int64), noise], axis=0)
    triples = np.unique(triples, axis=0)

    i2n = [f"node{i}" for i in range(num_nodes)]
    i2r = [f"rel{i}" for i in range(num_rels)]
    labeled = rng.permutation(num_nodes)[: int(num_nodes * labeled_frac)]
    split = len(labeled) // 2
    train = {i2n[i]: int(classes[i]) for i in labeled[:split]}
    test = {i2n[i]: int(classes[i]) for i in labeled[split:]}

    return NodeClassificationData(
        triples=triples,
        n2i={n: i for i, n in enumerate(i2n)},
        i2n=i2n,
        r2i={r: i for i, r in enumerate(i2r)},
        i2r=i2r,
        train=train,
        test=test,
    )


def synthetic_link_prediction(
    num_nodes: int = 200,
    num_rels: int = 6,
    num_edges: int = 2000,
    test_frac: float = 0.1,
    seed: int = 0,
    reciprocity: float = 0.0,
) -> LinkPredictionData:
    triples = synthetic_kg(
        num_nodes, num_rels, num_edges, seed=seed, reciprocity=reciprocity
    )
    n_test = max(1, int(len(triples) * test_frac))
    test, train = triples[:n_test], triples[n_test:]
    all_triples: Set[Tuple[int, int, int]] = {
        (int(a), int(b), int(c)) for a, b, c in triples
    }
    i2n = [f"node{i}" for i in range(num_nodes)]
    i2r = [f"rel{i}" for i in range(num_rels)]
    return LinkPredictionData(
        train=train,
        test=test,
        all_triples=all_triples,
        n2i={n: i for i, n in enumerate(i2n)},
        i2n=i2n,
        r2i={r: i for i, r in enumerate(i2r)},
        i2r=i2r,
    )


def wn18_like(seed: int = 0, reciprocity: float = 0.9) -> LinkPredictionData:
    """WN18-scale graph: 40,943 entities, 18 relations, ~141k train triples.

    ``reciprocity=0.9`` models WN18's documented inverse-pair structure
    (see :func:`synthetic_kg`); pass 0 for the structure-free variant.
    """
    return synthetic_link_prediction(
        num_nodes=40_943, num_rels=18, num_edges=146_500, test_frac=0.034,
        seed=seed, reciprocity=reciprocity,
    )


def fb_toy_like(seed: int = 0) -> LinkPredictionData:
    """FB-toy scale (arXiv:2107.10015): ~280 entities, 112 relations."""
    return synthetic_link_prediction(
        num_nodes=280, num_rels=112, num_edges=5_000, test_frac=0.1, seed=seed
    )


def aifb_like(seed: int = 0) -> NodeClassificationData:
    """AIFB-scale NC graph: ~8.3k nodes, 45 relations, ~29k triples."""
    return synthetic_node_classification(
        num_nodes=8_285, num_rels=45, num_edges=29_000, num_classes=4,
        labeled_frac=0.05, seed=seed,
    )
