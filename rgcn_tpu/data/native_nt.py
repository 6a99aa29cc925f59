"""ctypes bindings for the native gzipped N-Triples parser.

Host-side data loading acceleration (``native/nt_parser.cc``): streaming gz
decode + term scanning + interning + the deterministic sorted-vocabulary
remap run in C++; Python receives int32 ``(T, 3)`` triples and the sorted
node/relation vocabularies. Term semantics match
:mod:`rgcn_tpu.data.nt` exactly (``tests/test_native.py``); the loader
falls back to the Python scanner when the library is absent
(``make -C native``).
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Tuple

import numpy as np

__all__ = ["native_nt_available", "parse_nt_native"]

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
    try:
        lib.rgcn_nt_parse
    except AttributeError:
        return None  # stale library without the parser
    lib.rgcn_nt_parse.restype = ctypes.c_void_p
    lib.rgcn_nt_parse.argtypes = [ctypes.c_char_p]
    lib.rgcn_nt_error.restype = ctypes.c_char_p
    lib.rgcn_nt_error.argtypes = [ctypes.c_void_p]
    for fn in ("rgcn_nt_num_triples", "rgcn_nt_num_nodes", "rgcn_nt_num_rels"):
        getattr(lib, fn).restype = ctypes.c_int64
        getattr(lib, fn).argtypes = [ctypes.c_void_p]
    lib.rgcn_nt_vocab_bytes.restype = ctypes.c_int64
    lib.rgcn_nt_vocab_bytes.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.rgcn_nt_fill.restype = None
    lib.rgcn_nt_fill.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_char_p,
        ctypes.c_char_p,
    ]
    lib.rgcn_nt_free.restype = None
    lib.rgcn_nt_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_nt_available() -> bool:
    return _load() is not None


def parse_nt_native(
    path: str,
) -> Optional[Tuple[np.ndarray, List[str], List[str]]]:
    """Parse a gzipped N-Triples file natively.

    Returns ``(triples (T, 3) int64, node_vocab sorted, rel_vocab sorted)``
    with ids referring to the sorted vocabularies, or ``None`` when the
    native library is unavailable. Raises ``ValueError`` on malformed
    input (same contract as the Python scanner).
    """
    lib = _load()
    if lib is None:
        return None
    h = lib.rgcn_nt_parse(os.fsencode(path))
    if not h:
        raise FileNotFoundError(path)
    try:
        err = lib.rgcn_nt_error(h)
        if err:
            raise ValueError(err.decode("utf-8", "replace"))
        t = lib.rgcn_nt_num_triples(h)
        spo = np.empty((t, 3), dtype=np.int32)
        nb = lib.rgcn_nt_vocab_bytes(h, 0)
        rb = lib.rgcn_nt_vocab_bytes(h, 1)
        node_blob = ctypes.create_string_buffer(int(nb))
        rel_blob = ctypes.create_string_buffer(int(rb))
        lib.rgcn_nt_fill(
            h,
            spo.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            node_blob,
            rel_blob,
        )
        nodes = node_blob.raw.decode("utf-8").split("\n")[:-1]
        rels = rel_blob.raw.decode("utf-8").split("\n")[:-1]
        return spo.astype(np.int64), nodes, rels
    finally:
        lib.rgcn_nt_free(h)
