#!/usr/bin/env python
"""Round-2 gather-wall probes (single-process A/B, WN18 scale).

The basis op's edge stage (row gather + weighted one-hot aggregation) is
~1.38 ms of the 1.42 ms op, attributed to the XLA row gather (~6-7 ns/row,
latency-bound). Two untested leads:

1. **Per-block composition WITHOUT concat.** The earlier feature-block
   probe (bench.py --variant basis-blocks-bf16) composed the fast
   <=128-column input-buffer gathers through ``jnp.concatenate`` — an
   extra full-HBM pass that also lets XLA fuse the gathers into the
   elementwise consumer (losing the fast-path gather emitter). But the
   whole edge stage splits per feature block: gather, bias/relu/cast and
   the one-hot aggregation are all per-column. Probe the no-concat
   composition (two gathers -> two aggregations, never joined).

2. **Index locality.** Within a row block the aggregation kernel accepts
   any edge order (the one-hot handles arbitrary local_dst), so the
   layout can secondarily sort by SOURCE — gather indices become
   piecewise-ascending. Probe whether locality moves the latency wall.

Usage: python benchmarks/probe_gather2.py [--iters N] [--only SUBSTR]
Prints one JSON line per probe. TPU-only (compiled Pallas).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chained_time(step, y0, iters, reps=5):
    """bench._chained_time generalized to pytree-valued chains.

    Use ``iters`` large enough that the k1-k0 device-time difference
    dominates the ~23 ms fetch-RPC jitter on the tunneled backend — for
    ~1 ms ops that means >= 40 iters (measured: 12-iter chains can return
    NEGATIVE differences under jitter bursts)."""
    import jax

    step = jax.jit(step)

    def measure(k):
        y = step(y0)
        jax.tree_util.tree_map(lambda a: float(a.reshape(-1)[0]), y)
        ts = []
        for _ in range(reps):
            y = y0
            t0 = time.perf_counter()
            for _ in range(k):
                y = step(y)
            jax.tree_util.tree_map(lambda a: float(a.reshape(-1)[0]), y)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    k0, k1 = 2, 2 + iters
    return (measure(k1) - measure(k0)) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    from rgcn_tpu.utils.compile_cache import enable

    enable()

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import build_workload
    from rgcn_tpu.graph.structure import build_edge_set
    from rgcn_tpu.ops.pallas_aggregate import build_dst_layout
    from rgcn_tpu.ops.pallas_basis import (
        _sorted_inputs,
        weighted_aggregate_pallas,
    )

    triples, num_nodes, num_rels, dim = build_workload(False)
    es = build_edge_set(triples, num_nodes, num_rels, tile_size=512,
                        with_dst_layout=True)
    lay = build_dst_layout(np.asarray(es.dst), num_nodes,
                           row_block=128, chunk=256)
    es_b = dataclasses.replace(es, layout=lay)

    # --- src-secondary-sorted layout: same chunk structure, edges within a
    # row block ordered by source (gather indices piecewise-ascending) ---
    def build_dst_layout_srcsorted(dst, src, row_block=128, chunk=256):
        dst = np.asarray(dst)
        src = np.asarray(src)
        e = dst.shape[0]
        nrb = -(-num_nodes // row_block)
        keep = dst < num_nodes
        idx = np.nonzero(keep)[0]
        blk = dst[idx] // row_block
        order_local = np.lexsort((src[idx], blk))
        order = idx[order_local]
        dst_sorted = dst[order]
        block_of = dst_sorted // row_block
        counts = np.bincount(block_of, minlength=nrb)
        padded = np.maximum(-(-counts // chunk), 1) * chunk
        offsets = np.concatenate([[0], np.cumsum(padded)])[:-1]
        starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
        total = max(int(padded.sum()), chunk)
        pos = offsets[block_of] + (
            np.arange(order.shape[0]) - starts[block_of]
        )
        perm = np.full(total, e, dtype=np.int32)
        perm[pos] = order
        local = np.full(total, row_block, dtype=np.int32)
        local[pos] = dst_sorted - block_of * row_block
        n_chunks = total // chunk
        cum_padded = np.cumsum(padded)
        chunk_block = np.searchsorted(
            cum_padded, np.arange(n_chunks) * chunk, side="right"
        )
        chunk_block = np.minimum(chunk_block, nrb - 1).astype(np.int32)
        from rgcn_tpu.ops.pallas_aggregate import DstLayout

        return DstLayout(
            perm=perm.astype(np.int32),
            local_dst=local.reshape(n_chunks, chunk),
            chunk_block=chunk_block,
            num_row_blocks=int(nrb),
            row_block=int(row_block),
            chunk=int(chunk),
        )

    lay_ss = build_dst_layout_srcsorted(np.asarray(es.dst), np.asarray(es.src))
    assert lay_ss.num_chunks == lay.num_chunks
    es_ss = dataclasses.replace(es, layout=lay_ss)

    nb = 2
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(num_nodes, dim)).astype(np.float32))
    comps = jnp.asarray(
        rng.normal(size=(2 * num_rels, nb)).astype(np.float32)
    )

    src_sorted, wvec = _sorted_inputs(es_b, comps)
    src_sorted = jax.device_put(src_sorted)
    wvec = jax.device_put(wvec)
    src_sorted_ss, wvec_ss = _sorted_inputs(es_ss, comps)
    src_sorted_ss = jax.device_put(src_sorted_ss)
    wvec_ss = jax.device_put(wvec_ss)
    L = int(src_sorted.shape[0])
    edges_aug = es.num_edges + num_nodes

    xb = x.astype(jnp.bfloat16)
    x0 = jax.device_put(np.asarray(xb[:, :128]))
    x1 = jax.device_put(np.asarray(xb[:, 128:]))
    asc = jnp.asarray(
        np.sort(np.asarray(src_sorted)).astype(np.int32)
    )

    eps = jnp.asarray(1e-3, jnp.bfloat16)

    def _mix(y, contrib):
        return y + contrib.astype(y.dtype) * eps

    probes = {}

    # ---- gather-only probes (epilogue reads N of the L rows) ----
    def g_mono(y):
        xg = y[src_sorted]
        return _mix(y, xg[:num_nodes])

    probes["g-mono"] = (g_mono, xb)

    def g_mono_srcsort(y):
        xg = y[src_sorted_ss]
        return _mix(y, xg[:num_nodes])

    probes["g-mono-srcsort"] = (g_mono_srcsort, xb)

    def g_mono_asc(y):
        xg = y[asc]
        return _mix(y, xg[:num_nodes])

    probes["g-mono-ascending"] = (g_mono_asc, xb)

    def g_split(ys):
        y0, y1 = ys
        g0 = y0[src_sorted]
        g1 = y1[src_sorted]
        return (_mix(y0, g0[:num_nodes]), _mix(y1, g1[:num_nodes]))

    probes["g-split"] = (g_split, (x0, x1))

    def g_one128(y):
        xg = y[src_sorted]
        return _mix(y, xg[:num_nodes])

    # single (N, 128) input-buffer gather — the claimed fast path in
    # isolation; compare per-row time vs g-mono (d=200)
    probes["g-one128"] = (g_one128, x0)

    def g_one128_ss(y):
        xg = y[src_sorted_ss]
        return _mix(y, xg[:num_nodes])

    probes["g-one128-srcsort"] = (g_one128_ss, x0)

    # ---- edge-stage probes (gather + weighted aggregation) ----
    def e_mono(y):
        xg = y[src_sorted]
        agg = weighted_aggregate_pallas(
            xg, wvec, lay, num_nodes, compute_dtype=jnp.bfloat16
        )
        return _mix(y, agg.sum(axis=0)[:num_nodes])

    probes["e-mono"] = (e_mono, xb)

    def e_mono_srcsort(y):
        xg = y[src_sorted_ss]
        agg = weighted_aggregate_pallas(
            xg, wvec_ss, lay_ss, num_nodes, compute_dtype=jnp.bfloat16
        )
        return _mix(y, agg.sum(axis=0)[:num_nodes])

    probes["e-mono-srcsort"] = (e_mono_srcsort, xb)

    def e_split(ys):
        y0, y1 = ys
        g0 = y0[src_sorted]
        g1 = y1[src_sorted]
        a0 = weighted_aggregate_pallas(
            g0, wvec, lay, num_nodes, compute_dtype=jnp.bfloat16
        )
        a1 = weighted_aggregate_pallas(
            g1, wvec, lay, num_nodes, compute_dtype=jnp.bfloat16
        )
        return (
            _mix(y0, a0.sum(axis=0)[:num_nodes]),
            _mix(y1, a1.sum(axis=0)[:num_nodes]),
        )

    probes["e-split"] = (e_split, (x0, x1))

    def e_split_barrier(ys):
        y0, y1 = ys
        g0 = y0[src_sorted]
        g1 = y1[src_sorted]
        g0, g1 = jax.lax.optimization_barrier((g0, g1))
        a0 = weighted_aggregate_pallas(
            g0, wvec, lay, num_nodes, compute_dtype=jnp.bfloat16
        )
        a1 = weighted_aggregate_pallas(
            g1, wvec, lay, num_nodes, compute_dtype=jnp.bfloat16
        )
        return (
            _mix(y0, a0.sum(axis=0)[:num_nodes]),
            _mix(y1, a1.sum(axis=0)[:num_nodes]),
        )

    probes["e-split-barrier"] = (e_split_barrier, (x0, x1))

    def e_split_srcsort(ys):
        y0, y1 = ys
        g0 = y0[src_sorted_ss]
        g1 = y1[src_sorted_ss]
        a0 = weighted_aggregate_pallas(
            g0, wvec_ss, lay_ss, num_nodes, compute_dtype=jnp.bfloat16
        )
        a1 = weighted_aggregate_pallas(
            g1, wvec_ss, lay_ss, num_nodes, compute_dtype=jnp.bfloat16
        )
        return (
            _mix(y0, a0.sum(axis=0)[:num_nodes]),
            _mix(y1, a1.sum(axis=0)[:num_nodes]),
        )

    probes["e-split-srcsort"] = (e_split_srcsort, (x0, x1))

    for name, (fn, y0) in probes.items():
        if args.only and args.only not in name:
            continue
        try:
            dt = chained_time(fn, y0, args.iters)
            print(json.dumps({
                "probe": name,
                "ms": round(dt * 1e3, 3),
                "ns_per_row": round(dt / L * 1e9, 2),
                "edges_per_s": round(edges_aug / dt, 1),
            }), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"probe": name, "error": repr(e)[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
