"""Dataset loaders for node classification (RDF) and link prediction (triple
files).

Semantics mirror the reference loaders (``/root/reference/utils/data.py``):

* NC (``load_node_classification``): per-dataset file registry
  (aifb/am/bgs/mutag; gzipped N-Triples graph + train/test TSV with
  dataset-specific headers, ``data.py:81-106``); validation mode splits the
  first 40% of training rows off as test (``data.py:111-117``); labels become
  categorical codes in sorted-unique order (pandas ``.astype('category')``);
  optional 2-hop prune around labeled nodes (``data.py:143-146``); optional
  relation ``limit`` with a ``.rest`` bucket (``data.py:163-170``); pickle
  cache keyed by (dataset, split, prune) (``data.py:70-78,181-184``).
* LP (``load_link_prediction``): fb15k / fb15k-237 / fb-toy / wn18 / wn18rr
  train/valid/test text files; validation mode uses valid as test
  (``data.py:230-231``); vocab built over train+valid+test
  (``data.py:240-247``).

Node/relation index assignment differs from the reference only in being
*deterministic* (sorted vocab instead of Python-set iteration order); index
identity never affects metrics.
"""

from __future__ import annotations

import gzip
import os
import pickle
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Set, Tuple

import numpy as np

from rgcn_tpu.data.nt import iter_nt_file

__all__ = [
    "NodeClassificationData",
    "LinkPredictionData",
    "load_node_classification",
    "load_link_prediction",
    "DATA_ROOT",
]

DATA_ROOT = os.environ.get(
    "RGCN_TPU_DATA", os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "data")
)

_NC_REGISTRY = {
    # dataset -> (graph file, train tsv, test tsv, label header, node header)
    # Mirrors /root/reference/utils/data.py:81-106 (incl. the BGS "(lith)"
    # file names and AM's misspelled 'label_cateogory' header).
    "aifb": ("aifb/aifb_stripped.nt.gz", "aifb/trainingSet.tsv", "aifb/testSet.tsv",
             "label_affiliation", "person"),
    "am": ("am/am_stripped.nt.gz", "am/trainingSet.tsv", "am/testSet.tsv",
           "label_cateogory", "proxy"),
    "bgs": ("bgs/bgs_stripped.nt.gz", "bgs/trainingSet(lith).tsv", "bgs/testSet(lith).tsv",
            "label_lithogenesis", "rock"),
    "mutag": ("mutag/mutag_stripped.nt.gz", "mutag/trainingSet.tsv", "mutag/testSet.tsv",
              "label_mutagenic", "bond"),
}

_LP_REGISTRY = {
    "fb15k": "fb15k",
    "fb15k-237": "fB15k-237",
    "fb-toy": "fb-toy",
    "wn18": "wn18",
    "wn18rr": "wn18rr",
}


@dataclass
class NodeClassificationData:
    triples: np.ndarray  # (E, 3) int64 [s, p, o]
    n2i: Dict[str, int]
    i2n: List[str]
    r2i: Dict[str, int]
    i2r: List[str]
    train: Dict[str, int]  # node label -> class id
    test: Dict[str, int]
    num_classes: int = field(init=False)

    def __post_init__(self):
        classes = {int(c) for c in self.train.values()} | {
            int(c) for c in self.test.values()
        }
        self.num_classes = len(classes)
        # Dense label coding over the SHARED train∪test vocabulary
        # (mirrors the reference's categorical coding, data.py:119-127).
        # Raw label values are not necessarily 0..C-1 — a labeled subset
        # can miss a class entirely (e.g. sparse synthetic splits), and
        # out-of-range labels silently NaN the CE loss via
        # take_along_axis's fill mode. Identity map when values already
        # are 0..C-1, so loader-coded datasets are unchanged.
        self._class_code = {c: i for i, c in enumerate(sorted(classes))}

    @property
    def class_values(self):
        """Original label value per dense class code (code -> value);
        identity for loader-coded datasets."""
        return sorted(self._class_code)

    @property
    def num_nodes(self) -> int:
        return len(self.i2n)

    @property
    def num_relations(self) -> int:
        return len(self.i2r)

    def index_labels(self, split: Dict[str, int]) -> Tuple[np.ndarray, np.ndarray]:
        idx = np.array([self.n2i[n] for n in split], dtype=np.int64)
        lbl = np.array(
            [self._class_code[int(split[n])] for n in split], dtype=np.int64
        )
        return idx, lbl


@dataclass
class LinkPredictionData:
    train: np.ndarray  # (E, 3) int64
    test: np.ndarray
    all_triples: Set[Tuple[int, int, int]]
    n2i: Dict[str, int]
    i2n: List[str]
    r2i: Dict[str, int]
    i2r: List[str]

    @property
    def num_nodes(self) -> int:
        return len(self.i2n)

    @property
    def num_relations(self) -> int:
        return len(self.i2r)

    def pad_nodes(self, block_size: int) -> int:
        """Pad the node vocabulary so N is divisible by ``block_size``.

        Mirrors the runner's null-node padding for block decomposition
        (``experiments/predict_links.py:54-67``). Returns #nodes added.
        """
        added = 0
        while len(self.i2n) % block_size != 0:
            label = f"null{added}"
            self.n2i[label] = len(self.i2n)
            self.i2n.append(label)
            added += 1
        return added


def _read_tsv(path: str, label_header: str, nodes_header: str):
    import pandas as pd

    df = pd.read_csv(path, sep="\t", encoding="utf8")
    return list(df[nodes_header].values), list(df[label_header].values)


def _two_hop_prune(
    spo: np.ndarray, anchor_ids: Set[int], depth: int = 2
) -> np.ndarray:
    """Keep triples within ``depth`` hops of anchor nodes (both directions).

    Matches the recursive neighborhood collection of ``add_neighbors``
    (``utils/data.py:26-41``): a triple is kept when it is reachable during
    a depth-limited expansion that alternately follows outgoing edges from
    subjects and incoming edges to objects. Operates on interned id triples
    (the kept-index set depends only on node identity, so this is exactly
    the reference's string-level behavior).
    """
    out_adj: Dict[int, List[int]] = {}
    in_adj: Dict[int, List[int]] = {}
    for i, (s, _, o) in enumerate(spo):
        out_adj.setdefault(int(s), []).append(i)
        in_adj.setdefault(int(o), []).append(i)

    kept: Set[int] = set()
    frontier = set(anchor_ids)
    for _ in range(depth):
        next_frontier: Set[int] = set()
        for node in frontier:
            for i in out_adj.get(node, ()):  # (node, p, o): continue from o
                if i not in kept:
                    kept.add(i)
                next_frontier.add(int(spo[i][2]))
            for i in in_adj.get(node, ()):  # (s, p, node): continue from s
                if i not in kept:
                    kept.add(i)
                next_frontier.add(int(spo[i][0]))
        frontier = next_frontier
    return spo[sorted(kept)]


def _parse_graph(path: str) -> Tuple[np.ndarray, List[str], List[str]]:
    """Parse an ``.nt.gz`` graph into interned id triples + sorted vocabs.

    Uses the native C++ parser (``native/nt_parser.cc``) when compiled —
    identical output (``tests/test_native.py``) — else the Python scanner.
    """
    from rgcn_tpu.data.native_nt import parse_nt_native

    out = parse_nt_native(path)
    if out is not None:
        return out

    triples = list(iter_nt_file(path))
    nodes: Set[str] = set()
    rels: Set[str] = set()
    for s, p, o in triples:
        nodes.add(s)
        nodes.add(o)
        rels.add(p)
    i2n = sorted(nodes)
    i2r = sorted(rels)
    n2i = {n: i for i, n in enumerate(i2n)}
    r2i = {r: i for i, r in enumerate(i2r)}
    spo = np.empty((len(triples), 3), dtype=np.int64)
    for i, (s, p, o) in enumerate(triples):
        spo[i] = (n2i[s], r2i[p], n2i[o])
    return spo, i2n, i2r


def load_node_classification(
    name: str,
    final_run: bool = False,
    limit: Optional[int] = None,
    enable_cache: bool = True,
    val_prop: float = 0.4,
    prune: bool = False,
    data_root: Optional[str] = None,
) -> NodeClassificationData:
    """Load an RDF node-classification dataset (aifb / am / bgs / mutag)."""
    root = data_root or DATA_ROOT
    key = name.lower()
    if key not in _NC_REGISTRY:
        raise ValueError(f"could not find {name!r} dataset")
    graph_rel, train_rel, test_rel, label_header, nodes_header = _NC_REGISTRY[key]

    cachefile = os.path.join(
        root,
        key,
        f"cache_rgcn_tpu{'_test' if final_run else '_validation'}"
        f"{'_prune' if prune else ''}.pkl",
    )
    if enable_cache and limit is None and os.path.isfile(cachefile):
        with open(cachefile, "rb") as f:
            return pickle.load(f)

    nodes_train, labels_train = _read_tsv(
        os.path.join(root, train_rel), label_header, nodes_header
    )
    if final_run:
        nodes_test, labels_test = _read_tsv(
            os.path.join(root, test_rel), label_header, nodes_header
        )
    else:
        # First val_prop of the training rows becomes the test split
        # (utils/data.py:111-117).
        pivot = int(len(nodes_train) * val_prop)
        nodes_test, labels_test = nodes_train[:pivot], labels_train[:pivot]
        nodes_train, labels_train = nodes_train[pivot:], labels_train[pivot:]

    # One shared label vocabulary across splits. The reference codes each
    # split independently (``utils/data.py:119-127``, pandas
    # ``.astype('category')`` per file) — a silent mis-alignment whenever a
    # class is absent from one split. For the benchmark datasets every class
    # appears in both splits, so the shared coding is identical to the
    # reference there; this is a deliberate defect fix (SURVEY §7.8), not a
    # semantics change.
    cats = sorted(set(labels_train) | set(labels_test))
    lookup = {c: i for i, c in enumerate(cats)}
    train = dict(zip(nodes_train, (lookup[v] for v in labels_train)))
    test = dict(zip(nodes_test, (lookup[v] for v in labels_test)))

    spo, i2n_full, i2r_full = _parse_graph(os.path.join(root, graph_rel))

    if prune:
        n2i_full = {n: i for i, n in enumerate(i2n_full)}
        anchors = {
            n2i_full[n] for n in (set(train) | set(test)) if n in n2i_full
        }
        spo = _two_hop_prune(spo, anchors, depth=2)

    # Final vocabularies: nodes/relations present in the (possibly pruned)
    # graph, in sorted order — filtering the sorted full vocab preserves it.
    node_present = np.zeros(len(i2n_full), dtype=bool)
    node_present[spo[:, 0]] = True
    node_present[spo[:, 2]] = True
    old_nodes = np.nonzero(node_present)[0]
    i2n = [i2n_full[i] for i in old_nodes]
    n2i = {n: i for i, n in enumerate(i2n)}
    node_remap = np.full(len(i2n_full), -1, dtype=np.int64)
    node_remap[old_nodes] = np.arange(len(old_nodes))

    rel_counts = np.bincount(spo[:, 1], minlength=len(i2r_full))
    REST = ".rest"
    if limit is not None:
        # Counter.most_common order: count desc, ties by first occurrence
        # (utils/data.py:163-166 iterates the counter built in triple order)
        _, first_idx = np.unique(spo[:, 1], return_index=True)
        first_of = np.full(len(i2r_full), np.iinfo(np.int64).max, np.int64)
        present_rels = np.unique(spo[:, 1])
        first_of[present_rels] = first_idx
        order = sorted(
            (int(r) for r in present_rels),
            key=lambda r: (-int(rel_counts[r]), int(first_of[r])),
        )[:limit]
        i2r = [i2r_full[r] for r in order] + [REST, "inv." + REST]
        rel_remap = np.full(len(i2r_full), len(order), dtype=np.int64)  # REST
        for new, old in enumerate(order):
            rel_remap[old] = new
    else:
        old_rels = np.nonzero(rel_counts > 0)[0]
        i2r = [i2r_full[r] for r in old_rels]
        rel_remap = np.full(len(i2r_full), -1, dtype=np.int64)
        rel_remap[old_rels] = np.arange(len(old_rels))
    r2i = {r: i for i, r in enumerate(i2r)}

    edges = np.stack(
        [node_remap[spo[:, 0]], rel_remap[spo[:, 1]], node_remap[spo[:, 2]]],
        axis=1,
    )

    data = NodeClassificationData(
        triples=edges, n2i=n2i, i2n=i2n, r2i=r2i, i2r=i2r, train=train, test=test
    )

    if enable_cache and limit is None:
        os.makedirs(os.path.dirname(cachefile), exist_ok=True)
        with open(cachefile, "wb") as f:
            pickle.dump(data, f)
    return data


def _load_triple_file(path: str) -> List[List[str]]:
    with open(path, "r", encoding="utf-8") as f:
        return [line.split() for line in f if line.strip()]


def load_link_prediction(
    name: str,
    final_run: bool = False,
    limit: Optional[int] = None,
    data_root: Optional[str] = None,
) -> LinkPredictionData:
    """Load a triple-store link-prediction dataset."""
    root = data_root or DATA_ROOT
    key = name.lower()
    if key not in _LP_REGISTRY:
        raise ValueError(f"could not find {name!r} dataset")
    d = os.path.join(root, _LP_REGISTRY[key])

    train_s = _load_triple_file(os.path.join(d, "train.txt"))
    val_s = _load_triple_file(os.path.join(d, "valid.txt"))
    test_s = _load_triple_file(os.path.join(d, "test.txt"))

    if not final_run:
        test_s = val_s
    if limit:
        train_s, test_s = train_s[:limit], test_s[:limit]

    nodes: Set[str] = set()
    rels: Set[str] = set()
    for s, p, o in train_s + val_s + test_s:
        nodes.add(s)
        rels.add(p)
        nodes.add(o)

    i2n, i2r = sorted(nodes), sorted(rels)
    n2i = {n: i for i, n in enumerate(i2n)}
    r2i = {r: i for i, r in enumerate(i2r)}

    def idx(rows: List[List[str]]) -> np.ndarray:
        out = np.empty((len(rows), 3), dtype=np.int64)
        for i, (s, p, o) in enumerate(rows):
            out[i] = (n2i[s], r2i[p], n2i[o])
        return out

    all_triples = {
        (n2i[s], r2i[p], n2i[o]) for s, p, o in train_s + val_s + test_s
    }

    return LinkPredictionData(
        train=idx(train_s),
        test=idx(test_s),
        all_triples=all_triples,
        n2i=n2i,
        i2n=i2n,
        r2i=r2i,
        i2r=i2r,
    )
