"""Lane-tile-aware row gather (kept as a measured-and-closed probe site).

History (v5e, tunneled backend): early microbenchmarks suggested XLA's TPU
row gather had a fast path for ≤128-column tables entering the program as
input buffers (0.2-1.7 ns/row vs ~7.5 for wider rows). Under sound timing
(long async chains — ``benchmarks/probe_gather2.py``; short 12-iter chains
on this backend can return differences dominated by ~23 ms fetch-RPC
jitter, including NEGATIVE times) the fast path does NOT exist:

* d=200 f32 monolithic gather, 367k rows: **3.52 ns/row**
* the same rows from a (N, 128) bf16 table: **6.17 ns/row** — narrower is
  *slower*, not faster
* two ≤128-column gathers covering the same 200 columns: ~12% faster than
  the single wide gather in isolation, but *slower* once composed with the
  Pallas aggregation consumer (probe_gather3), with or without
  source-sorted layouts or optimization barriers.

Conclusion: the gather is row-overhead-bound at ~3.5 ns/row (~114 GB/s
effective on 400-byte rows) regardless of width/dtype, and splitting wide
rows buys nothing end-to-end. ``tile_gather`` therefore intentionally
degenerates to ``table[idx]``; it remains the single call site to revisit
if a future backend changes the economics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["tile_gather", "LANE_TILE"]

LANE_TILE = 128


def tile_gather(table: jax.Array, idx: jax.Array, tile: int = LANE_TILE):
    """``table[idx]`` (gather along axis 0); see module docstring for why
    no width-splitting is performed."""
    del tile
    if table.ndim == 2:
        return table[idx]
    lead = table.shape[0]
    rest = table.shape[1:]
    flat = table.reshape(lead, -1)
    out = flat[idx]
    return out.reshape((idx.shape[0],) + rest)
