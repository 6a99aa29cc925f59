"""Native (C++) graph builder: bit-identical to the NumPy path, and faster
on large graphs."""

import numpy as np
import pytest

from rgcn_tpu.graph.native import build_edge_set_native, native_available
from rgcn_tpu.graph.structure import build_edge_set
from tests.conftest import make_random_triples

pytestmark = pytest.mark.skipif(
    not native_available(), reason="librgcn_native.so not built"
)


@pytest.mark.parametrize("tile_size", [8, 128])
def test_native_matches_numpy(tile_size):
    rng = np.random.default_rng(70)
    n, r = 60, 6
    triples = make_random_triples(rng, n, r, 300)
    a = build_edge_set(triples, n, r, tile_size=tile_size, prefer_native=False)
    b = build_edge_set_native(triples, n, r, tile_size=tile_size)
    np.testing.assert_array_equal(a.src, b.src)
    np.testing.assert_array_equal(a.dst, b.dst)
    np.testing.assert_array_equal(a.rel, b.rel)
    np.testing.assert_array_equal(a.tile_rel, b.tile_rel)
    np.testing.assert_allclose(a.val, b.val, rtol=1e-6)
    assert a.num_edges == b.num_edges


def test_native_dst_layout_bit_identical():
    """The counting-sort layout builder (native/layout_builder.cc) must
    reproduce build_dst_layout exactly — perm ordering included (stable
    counting sort == np.argsort(dst, kind='stable'))."""
    from rgcn_tpu.ops.pallas_aggregate import build_dst_layout

    rng = np.random.default_rng(41)
    for _ in range(25):
        n = int(rng.integers(5, 2500))
        e = int(rng.integers(0, 6000))
        rb = int(rng.choice([8, 64, 128, 256]))
        ch = int(rng.choice([16, 128, 256]))
        dst = rng.integers(0, n + 1, e).astype(np.int32)  # incl. pads == n
        base = build_dst_layout(dst, n, rb, ch, prefer_native=False)
        nat = build_dst_layout(dst, n, rb, ch, prefer_native=True)
        pad_to = base.perm.shape[0] + int(rng.integers(0, 4)) * ch
        base_p = build_dst_layout(
            dst, n, rb, ch, pad_to=pad_to, prefer_native=False
        )
        nat_p = build_dst_layout(
            dst, n, rb, ch, pad_to=pad_to, prefer_native=True
        )
        for a, b in ((base, nat), (base_p, nat_p)):
            np.testing.assert_array_equal(a.perm, b.perm)
            np.testing.assert_array_equal(a.local_dst, b.local_dst)
            np.testing.assert_array_equal(a.chunk_block, b.chunk_block)
            assert (a.num_row_blocks, a.row_block, a.chunk) == (
                b.num_row_blocks, b.row_block, b.chunk
            )


def test_native_lexsort_rel_dst_bit_identical():
    """The two-pass counting sort must equal np.lexsort((dst, rel)) exactly,
    stability included (ties keep original order)."""
    from rgcn_tpu.graph.native import lexsort_rel_dst

    rng = np.random.default_rng(43)
    for _ in range(25):
        e = int(rng.integers(0, 5000))
        nr = int(rng.integers(1, 40))
        nd = int(rng.integers(1, 3000))
        rel = rng.integers(0, nr, e).astype(np.int32)
        dst = rng.integers(0, nd, e).astype(np.int32)
        np.testing.assert_array_equal(
            np.lexsort((dst, rel)), lexsort_rel_dst(rel, dst, nr, nd)
        )
    # out-of-range values -> None (caller falls back to NumPy)
    assert lexsort_rel_dst(
        np.array([5], np.int32), np.array([0], np.int32), 3, 10
    ) is None


def test_native_dst_layout_rejects_bad_pad_to():
    from rgcn_tpu.ops.pallas_aggregate import build_dst_layout

    dst = np.arange(100, dtype=np.int32) % 50
    with pytest.raises(ValueError):
        build_dst_layout(dst, 50, 8, 16, pad_to=17, prefer_native=True)


def test_native_large_graph_speed():
    """Sanity: native path handles a million-edge graph and agrees."""
    rng = np.random.default_rng(71)
    n, r, e = 50_000, 40, 500_000
    triples = np.stack(
        [
            rng.integers(0, n, e),
            rng.integers(0, r, e),
            rng.integers(0, n, e),
        ],
        axis=1,
    ).astype(np.int64)
    import time

    t0 = time.perf_counter()
    b = build_edge_set_native(triples, n, r, tile_size=256)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    a = build_edge_set(triples, n, r, tile_size=256, prefer_native=False)
    t_numpy = time.perf_counter() - t0
    np.testing.assert_array_equal(a.src, b.src)
    np.testing.assert_array_equal(a.dst, b.dst)
    np.testing.assert_allclose(a.val, b.val, rtol=1e-6)
    print(f"native {t_native*1e3:.0f}ms vs numpy {t_numpy*1e3:.0f}ms")


def test_native_nt_parser_matches_python_scanner(tmp_path):
    """The C++ N-Triples parser (native/nt_parser.cc) must produce exactly
    the Python scanner's term strings and the same sorted-vocab ids —
    including literals with escapes/@lang/^^<dt>, blank nodes, comments and
    long lines."""
    import gzip

    import numpy as np
    import pytest

    from rgcn_tpu.data.native_nt import native_nt_available, parse_nt_native
    from rgcn_tpu.data.nt import iter_nt_file

    if not native_nt_available():
        pytest.skip("native library not built")

    lines = [
        "<http://a/s1> <http://p/r1> <http://a/o1> .",
        '<http://a/s1> <http://p/r2> "plain literal" .',
        '<http://a/s2> <http://p/r2> "esc \\"q\\" lit"^^<http://t/int> .',
        '<http://a/s2> <http://p/r1> "hallo"@de .',
        "_:b0 <http://p/r3> _:b1 .",
        "# a comment line",
        "",
        "<http://a/s3> <http://p/r3> <http://a/" + "x" * 70000 + "> .",
    ]
    path = tmp_path / "g.nt.gz"
    with gzip.open(path, "wt") as f:
        f.write("\n".join(lines) + "\n")

    py = list(iter_nt_file(str(path)))
    spo, i2n, i2r = parse_nt_native(str(path))

    # same vocabularies (sorted)
    nodes = sorted({t[0] for t in py} | {t[2] for t in py})
    rels = sorted({t[1] for t in py})
    assert i2n == nodes and i2r == rels

    # same triples under the sorted-vocab ids
    n2i = {n: i for i, n in enumerate(nodes)}
    r2i = {r: i for i, r in enumerate(rels)}
    want = np.array([(n2i[s], r2i[p], n2i[o]) for s, p, o in py])
    np.testing.assert_array_equal(spo, want)
