"""Lane-tile-aware row gather.

XLA's TPU row gather has a fast path when the gathered row fits one
128-lane tile and falls off a cliff beyond it (measured on v5e at 255k
rows: d=128 → 0.2 ns/row, d=200/256 → ~8 ns/row — 40×). Splitting a wide
gather into per-≤128-column gathers recovers the fast path at the cost of
slicing the table (a cheap O(N·d) pass, or free when the caller keeps the
table pre-split).

``tile_gather(table, idx)`` is the drop-in: identical result to
``table[idx]``, implemented as per-tile gathers + concat for wide rows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["tile_gather", "LANE_TILE"]

LANE_TILE = 128


def tile_gather(table: jax.Array, idx: jax.Array, tile: int = LANE_TILE):
    """``table[idx]`` (gather along axis 0) via lane-tile-sized gathers.

    ``table``: ``(N, d)`` or ``(N, ..., d)`` — trailing dims are flattened
    for the split and restored afterwards.
    """
    if table.ndim == 2:
        d = table.shape[1]
        if d <= tile:
            return table[idx]
        # Wide rows currently stay on the plain gather. Measured facts
        # (v5e, 255k rows): gathers from ≤128-column tables that enter the
        # program as INPUT buffers run at ~1.7 ns/row vs ~7.5 for wide
        # rows (4.5×) — but the trick does NOT survive in-graph
        # materialization: slicing inside the program (with or without an
        # optimization_barrier) keeps or worsens the slow path (~7.5-10
        # ns/row), so only gathers whose tables cross a jit boundary can
        # exploit it today (round-3: layout-pinned intermediates).
        return table[idx]
    lead = table.shape[0]
    rest = table.shape[1:]
    flat = table.reshape(lead, -1)
    out = tile_gather(flat, idx, tile)
    return out.reshape((idx.shape[0],) + rest)
