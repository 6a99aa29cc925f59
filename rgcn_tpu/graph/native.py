"""ctypes bindings for the native (C++/OpenMP) graph builder.

The compute path is JAX/XLA/Pallas on TPU; this accelerates the *host-side*
preprocessing (relation-sorted tile-padded layout) for large graphs. Built
with ``make -C native``; falls back to the NumPy implementation in
:mod:`rgcn_tpu.graph.structure` when the shared library is absent. Outputs
are bit-identical to the NumPy path (``tests/test_native.py``).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

__all__ = [
    "native_available",
    "build_edge_set_native",
    "build_dst_layout_native",
    "lexsort_rel_dst",
]

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "librgcn_native.so",
)

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.rgcn_build_edge_set.restype = ctypes.c_int64
    lib.rgcn_build_edge_set.argtypes = [
        ctypes.POINTER(ctypes.c_int64),  # triples
        ctypes.c_int64,  # num_triples
        ctypes.c_int64,  # num_nodes
        ctypes.c_int64,  # num_rels
        ctypes.c_int64,  # tile_size
        ctypes.POINTER(ctypes.c_int32),  # src_out
        ctypes.POINTER(ctypes.c_int32),  # dst_out
        ctypes.POINTER(ctypes.c_int32),  # rel_out
        ctypes.POINTER(ctypes.c_float),  # val_out
        ctypes.POINTER(ctypes.c_int32),  # tile_rel_out
        ctypes.c_int64,  # capacity
    ]
    if hasattr(lib, "rgcn_build_dst_layout"):
        lib.rgcn_build_dst_layout.restype = ctypes.c_int64
        lib.rgcn_build_dst_layout.argtypes = [
            ctypes.POINTER(ctypes.c_int32),  # dst
            ctypes.c_int64,  # e
            ctypes.c_int64,  # num_nodes
            ctypes.c_int64,  # row_block
            ctypes.c_int64,  # chunk
            ctypes.c_int64,  # pad_to (<=0: none)
            ctypes.POINTER(ctypes.c_int32),  # perm_out
            ctypes.POINTER(ctypes.c_int32),  # local_out
            ctypes.POINTER(ctypes.c_int32),  # chunk_block_out
            ctypes.c_int64,  # capacity
        ]
    if hasattr(lib, "rgcn_lexsort_rel_dst"):
        lib.rgcn_lexsort_rel_dst.restype = ctypes.c_int64
        lib.rgcn_lexsort_rel_dst.argtypes = [
            ctypes.POINTER(ctypes.c_int32),  # rel
            ctypes.POINTER(ctypes.c_int32),  # dst
            ctypes.c_int64,  # e
            ctypes.c_int64,  # num_rel_bins
            ctypes.c_int64,  # num_dst_bins
            ctypes.POINTER(ctypes.c_int32),  # order_out
        ]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def lexsort_rel_dst(
    rel: np.ndarray,
    dst: np.ndarray,
    num_rel_bins: int,
    num_dst_bins: int,
) -> Optional[np.ndarray]:
    """``np.lexsort((dst, rel))`` via the native two-pass counting sort
    (bit-identical, incl. stability). Returns ``None`` when the library is
    absent or values fall outside the declared bins — callers fall back to
    NumPy."""
    lib = _load()
    if lib is None or not hasattr(lib, "rgcn_lexsort_rel_dst"):
        return None
    rel = np.ascontiguousarray(rel, dtype=np.int32)
    dst = np.ascontiguousarray(dst, dtype=np.int32)
    e = rel.shape[0]
    order = np.empty(e, dtype=np.int32)

    def ptr(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))

    rc = lib.rgcn_lexsort_rel_dst(
        ptr(rel), ptr(dst), e, int(num_rel_bins), int(num_dst_bins),
        ptr(order),
    )
    if rc != 0:
        return None
    return order


def build_dst_layout_native(
    dst: np.ndarray,
    num_nodes: int,
    row_block: int,
    chunk: int,
    pad_to: Optional[int] = None,
):
    """Native :func:`rgcn_tpu.ops.pallas_aggregate.build_dst_layout`
    (stable counting sort by destination, O(E + N) instead of the NumPy
    argsort's O(E log E)). Returns ``None`` when the shared library is
    absent or lacks the symbol (callers fall back to NumPy); raises on
    contract violations so failures stay loud."""
    lib = _load()
    if lib is None or not hasattr(lib, "rgcn_build_dst_layout"):
        return None

    from rgcn_tpu.ops.pallas_aggregate import DstLayout

    dst = np.ascontiguousarray(dst, dtype=np.int32)
    e = dst.shape[0]
    nrb = -(-num_nodes // row_block)
    # upper bound: every block padded one chunk past its real edges
    cap = max(nrb * chunk + ((e + chunk - 1) // chunk + nrb) * chunk, chunk)
    if pad_to is not None:
        cap = max(cap, int(pad_to))
    perm = np.empty(cap, dtype=np.int32)
    local = np.empty(cap, dtype=np.int32)
    chunk_block = np.empty(cap // chunk + 1, dtype=np.int32)

    def ptr(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))

    total = lib.rgcn_build_dst_layout(
        ptr(dst), e, num_nodes, row_block, chunk,
        0 if pad_to is None else int(pad_to),
        ptr(perm), ptr(local), ptr(chunk_block), cap,
    )
    if total == -2:
        raise ValueError(
            f"pad_to={pad_to} < layout total or not a multiple of "
            f"chunk {chunk}"
        )
    if total < 0:
        raise RuntimeError("native layout builder: capacity underestimated")
    total = int(total)
    n_chunks = total // chunk
    return DstLayout(
        perm=perm[:total].copy(),
        local_dst=local[:total].copy().reshape(n_chunks, chunk),
        chunk_block=chunk_block[:n_chunks].copy(),
        num_row_blocks=int(nrb),
        row_block=int(row_block),
        chunk=int(chunk),
    )


def build_edge_set_native(
    triples: np.ndarray,
    num_nodes: int,
    num_rels: int,
    tile_size: int = 128,
    tile_multiple: int = 1,
    with_dst_layout: bool = False,
    layout_row_block=None,
    layout_chunk=None,
):
    """Native-accelerated :func:`rgcn_tpu.graph.structure.build_edge_set`.

    Returns ``None`` when the shared library is not built (callers fall back
    to the NumPy path).
    """
    lib = _load()
    if lib is None:
        return None

    from rgcn_tpu.graph.structure import EdgeSet

    triples = np.ascontiguousarray(triples, dtype=np.int64)
    e = triples.shape[0]
    num_general = 2 * num_rels
    capacity = 2 * e + num_general * tile_size + tile_size

    src = np.empty(capacity, dtype=np.int32)
    dst = np.empty(capacity, dtype=np.int32)
    rel = np.empty(capacity, dtype=np.int32)
    val = np.empty(capacity, dtype=np.float32)
    tile_rel = np.empty(capacity // tile_size + 1, dtype=np.int32)

    def ptr(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    e_pad = lib.rgcn_build_edge_set(
        ptr(triples, ctypes.c_int64),
        e,
        num_nodes,
        num_rels,
        tile_size,
        ptr(src, ctypes.c_int32),
        ptr(dst, ctypes.c_int32),
        ptr(rel, ctypes.c_int32),
        ptr(val, ctypes.c_float),
        ptr(tile_rel, ctypes.c_int32),
        capacity,
    )
    if e_pad < 0:
        raise RuntimeError("native graph builder: capacity underestimated")
    e_pad = int(e_pad)

    if tile_multiple > 1:
        chunk = tile_size * tile_multiple
        target = (e_pad + chunk - 1) // chunk * chunk
        if target > e_pad:
            extra = target - e_pad
            src = np.concatenate([src[:e_pad], np.zeros(extra, np.int32)])
            dst = np.concatenate(
                [dst[:e_pad], np.full(extra, num_nodes, np.int32)]
            )
            val = np.concatenate([val[:e_pad], np.zeros(extra, np.float32)])
            last_rel = tile_rel[e_pad // tile_size - 1]
            rel = np.concatenate(
                [rel[:e_pad], np.full(extra, last_rel, np.int32)]
            )
            tile_rel = np.concatenate(
                [
                    tile_rel[: e_pad // tile_size],
                    np.full(extra // tile_size, last_rel, np.int32),
                ]
            )
            e_pad = target
        else:
            src, dst, rel, val = (
                src[:e_pad], dst[:e_pad], rel[:e_pad], val[:e_pad],
            )
            tile_rel = tile_rel[: e_pad // tile_size]
    else:
        src, dst, rel, val = src[:e_pad], dst[:e_pad], rel[:e_pad], val[:e_pad]
        tile_rel = tile_rel[: e_pad // tile_size]

    es = EdgeSet(
        src=src,
        dst=dst,
        rel=rel,
        val=val,
        tile_rel=tile_rel,
        num_nodes=int(num_nodes),
        num_rels=int(num_general),
        tile_size=int(tile_size),
        num_edges=int(2 * e),
    )
    if with_dst_layout:
        import dataclasses

        from rgcn_tpu.graph.structure import _assemble_edge_set
        from rgcn_tpu.ops.pallas_aggregate import build_dst_layout

        kw = {}
        if layout_row_block is not None:
            kw["row_block"] = layout_row_block
        if layout_chunk is not None:
            kw["chunk"] = layout_chunk
        layout = build_dst_layout(dst, num_nodes, **kw)
        # reverse structure for the Pallas VJP: swap src/dst on the real
        # edges, keep the forward normalization values
        real = val > 0
        r_src, r_dst = dst[real], src[real]
        r_rel, r_val = rel[real], val[real]
        r_order = np.lexsort((r_dst, r_rel))
        rev = _assemble_edge_set(
            r_src[r_order].astype(np.int64),
            r_dst[r_order].astype(np.int64),
            r_rel[r_order].astype(np.int64),
            r_val[r_order],
            num_nodes, num_general, tile_size, tile_multiple, True,
            layout_row_block=layout_row_block, layout_chunk=layout_chunk,
        )
        from rgcn_tpu.ops.pallas_fused import build_fused_layout

        rev = dataclasses.replace(rev, fused=build_fused_layout(rev))
        es = dataclasses.replace(
            es, layout=layout, reverse=rev, fused=build_fused_layout(es)
        )
    return es
