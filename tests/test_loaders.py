"""L0 loader tests on fabricated datasets (the container ships no real
data): N-Triples parsing, NC registry/split/prune/cache semantics, LP
vocab/valid-as-test semantics — the contract of
``/root/reference/utils/data.py``."""

import gzip
import os

import numpy as np
import pytest

from rgcn_tpu.data.loaders import (
    load_link_prediction,
    load_node_classification,
)
from rgcn_tpu.data.nt import parse_nt_line


def test_parse_nt_terms():
    s, p, o = parse_nt_line(
        '<http://a/x> <http://p/rel> "lit with \\"q\\""^^<http://t> .'
    )
    assert s == "http://a/x" and p == "http://p/rel"
    assert o == '"lit with \\"q\\""^^<http://t>'
    s, p, o = parse_nt_line("_:b0 <http://p> <http://a/y> .")
    assert s == "_:b0" and o == "http://a/y"
    s, p, o = parse_nt_line('<http://a> <http://p> "hello"@en .')
    assert o == '"hello"@en'
    assert parse_nt_line("# comment") is None
    assert parse_nt_line("") is None


def _write_nc_dataset(root):
    d = os.path.join(root, "aifb")
    os.makedirs(d)
    people = [f"http://ex/person{i}" for i in range(10)]
    lines = []
    for i in range(10):
        lines.append(f"<{people[i]}> <http://ex/knows> <{people[(i+1)%10]}> .")
        lines.append(
            f"<{people[i]}> <http://ex/affil> <http://ex/group{i%2}> ."
        )
    # an unrelated far-away component (pruned at depth 2 from labels)
    lines.append("<http://ex/far1> <http://ex/knows> <http://ex/far2> .")
    with gzip.open(os.path.join(d, "aifb_stripped.nt.gz"), "wt") as f:
        f.write("\n".join(lines) + "\n")

    def tsv(path, rows):
        with open(path, "w") as f:
            f.write("person\tlabel_affiliation\n")
            for n, l in rows:
                f.write(f"{n}\t{l}\n")

    tsv(
        os.path.join(d, "trainingSet.tsv"),
        [(people[i], f"g{i%2}") for i in range(8)],
    )
    tsv(
        os.path.join(d, "testSet.tsv"),
        [(people[i], f"g{i%2}") for i in range(8, 10)],
    )


def test_nc_loader_final_run(tmp_path):
    _write_nc_dataset(tmp_path)
    data = load_node_classification(
        "aifb", final_run=True, data_root=str(tmp_path)
    )
    assert data.num_classes == 2
    assert len(data.train) == 8 and len(data.test) == 2
    assert data.triples.shape[1] == 3
    # every labeled node resolvable
    idx, lbl = data.index_labels(data.train)
    assert idx.shape == lbl.shape == (8,)


def test_nc_loader_validation_split(tmp_path):
    _write_nc_dataset(tmp_path)
    data = load_node_classification(
        "aifb", final_run=False, data_root=str(tmp_path), enable_cache=False
    )
    # first 40% of 8 training rows become the validation-as-test split
    assert len(data.test) == 3 and len(data.train) == 5


def test_nc_loader_prune(tmp_path):
    _write_nc_dataset(tmp_path)
    full = load_node_classification(
        "aifb", final_run=True, data_root=str(tmp_path), enable_cache=False
    )
    pruned = load_node_classification(
        "aifb", final_run=True, prune=True, data_root=str(tmp_path),
        enable_cache=False,
    )
    # the far1-far2 edge is > 2 hops from any labeled node
    assert len(pruned.triples) < len(full.triples)
    far = [n for n in pruned.i2n if "far" in n]
    assert not far


def test_nc_loader_cache_roundtrip(tmp_path):
    _write_nc_dataset(tmp_path)
    a = load_node_classification("aifb", final_run=True, data_root=str(tmp_path))
    cachefile = os.path.join(
        str(tmp_path), "aifb", "cache_rgcn_tpu_test.pkl"
    )
    assert os.path.exists(cachefile)
    b = load_node_classification("aifb", final_run=True, data_root=str(tmp_path))
    np.testing.assert_array_equal(a.triples, b.triples)
    assert a.train == b.train


def _write_lp_dataset(root):
    d = os.path.join(root, "wn18")
    os.makedirs(d)
    rows = [(f"e{i}", f"r{i%3}", f"e{(i+1)%20}") for i in range(20)]
    for name, rs in (
        ("train.txt", rows[:14]),
        ("valid.txt", rows[14:17]),
        ("test.txt", rows[17:]),
    ):
        with open(os.path.join(d, name), "w") as f:
            for s, p, o in rs:
                f.write(f"{s}\t{p}\t{o}\n")


def test_lp_loader(tmp_path):
    _write_lp_dataset(tmp_path)
    val_run = load_link_prediction("wn18", final_run=False, data_root=str(tmp_path))
    assert len(val_run.test) == 3  # valid used as test
    final = load_link_prediction("wn18", final_run=True, data_root=str(tmp_path))
    assert len(final.test) == 3 and len(final.train) == 14
    assert len(final.all_triples) == 20  # vocab + truth over all splits
    assert final.num_relations == 3


def test_unknown_dataset_raises(tmp_path):
    with pytest.raises(ValueError, match="could not find"):
        load_node_classification("nope", data_root=str(tmp_path))
    with pytest.raises(ValueError, match="could not find"):
        load_link_prediction("nope", data_root=str(tmp_path))


def test_nc_loader_relation_limit(tmp_path):
    """``limit`` keeps the most frequent relations and buckets the rest into
    '.rest' (reference ``utils/data.py:163-170``); caching is bypassed."""
    _write_nc_dataset(tmp_path)
    data = load_node_classification(
        "aifb", final_run=True, data_root=str(tmp_path), limit=1,
        enable_cache=False,
    )
    # 1 kept relation + '.rest' + 'inv..rest'
    assert len(data.i2r) == 3
    assert ".rest" in data.r2i
    # every edge's relation id is in range
    assert data.triples[:, 1].max() < len(data.i2r)


def test_nc_labels_coded_densely():
    """A labeled subset that misses a class value must still produce
    labels in [0, num_classes) — raw values would silently NaN the CE
    loss (take_along_axis fills out-of-range gathers with NaN)."""
    from rgcn_tpu.data.loaders import NodeClassificationData

    data = NodeClassificationData(
        triples=np.zeros((0, 3), dtype=np.int64),
        n2i={"a": 0, "b": 1, "c": 2},
        i2n=["a", "b", "c"],
        r2i={"r": 0},
        i2r=["r"],
        train={"a": 1, "b": 3},  # class 0/2 absent: values {1, 3}
        test={"c": 3},
    )
    assert data.num_classes == 2
    _, train_lbl = data.index_labels(data.train)
    _, test_lbl = data.index_labels(data.test)
    assert train_lbl.tolist() == [0, 1]
    assert test_lbl.tolist() == [1]
