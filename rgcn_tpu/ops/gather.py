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

ROUND-9 REVISION (``benchmarks/probe_gather6.py``, interleaved chains,
canary-quiet tunnel): the per-row law holds and extends — ISOLATED
gathers stay fast at every scale probed:

* 33 MB bf16 wide table: 6.3 / 4.4 / 4.3 / 4.5 ns/row at 137k / 400k /
  800k / 1.6M rows
* 240 MB bf16 wide table: 32.9 / 16.6 / 12.9 / 10.8 ns/row (a ~4 ms
  fixed term amortizing out, NOT a per-row penalty)
* the AM fan shape — (590k, 10) f32 table, 1.5M rows: 6.2 ns/row (9.2 ms)

BUT the same gather shapes INSIDE the AM-scale NC program measure
115-175 ns/row (probe_stress_nc xp_fan 171 ms, xp_agg's perm ~220 ms,
xp_fusedw/xp_unfusedw ~290 ms) — a 20-30x inflation from program
context, independent of row width (xp_*128 equal) and of
mosaic.allow_input_fusion (fused == unfused). The gather engine is not
the wall; XLA's fusion/emitter choices around gathers in large programs
are. See probe_stress_nc's barrier variants (xp_fan_bar/xp_perm/
xp_agg_bar) for the consumer-fusion discrimination campaign.
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
