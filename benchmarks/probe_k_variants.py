#!/usr/bin/env python
"""Roofline reconciliation: k=0 vs k=2 layout variants, draws vs rows.

The r04 official bench winner contradicted the published roofline model:
ch=256/k=0 (155,392 slots) re-measured 0.817 ms = 5.26 ns/row, while the
BASELINE.md model built on the k=2 winner (137,472 slots) puts the
descriptor floor at 137k x 3.5 ns ~= 0.48 ms — i.e. the day's fastest
draw had MORE rows and LOWER total time than the fewer-rows variant's
typical floor. Hypothesis: compile-draw spread (~0.2 ms long-chain on one
identical program) exceeds the k-variant row-count delta (18k rows x
3.5 ns ~= 0.06 ms), so the adaptive search picks whichever variant drew
best — the roofline needs a draw-variance term.

This probe measures exactly that: N fresh compile draws per variant
(short-chain ranked), then INTERLEAVED long chains across each variant's
best draw — the same-process min-based comparison that survives
congestion — plus per-draw long-chain re-measures to quantify the spread.
Canary-bracketed.

    python benchmarks/probe_k_variants.py --draws 4 --rounds 4
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--draws", type=int, default=4)
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--iters", type=int, default=100,
                    help="long-chain iterations (sub-ms op: >=60 required)")
    ap.add_argument("--variants", default="256:0,256:2",
                    help="comma list of ch:k layout variants")
    ap.add_argument("--no-canary", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        from rgcn_tpu.utils.compile_cache import enable

        enable()

    canary = {}
    if not args.cpu and not args.no_canary:
        from rgcn_tpu.utils.canary import measure_canary

        canary["before"] = measure_canary(tag="before")

    import jax
    import jax.numpy as jnp

    import bench
    from rgcn_tpu.graph.coalesce import build_merged_layout
    from rgcn_tpu.graph.structure import build_edge_set
    from rgcn_tpu.ops.pallas_basis import rel_spmm_basis_merged_ad

    triples, num_nodes, num_rels, dim = bench.build_workload(quick=args.cpu)
    es = build_edge_set(triples, num_nodes, num_rels, tile_size=512)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(num_nodes, dim)).astype(np.float32))
    w_self = jnp.asarray(rng.normal(size=(dim, dim)).astype(np.float32))
    rng_b = np.random.default_rng(1)
    bases = jnp.asarray(
        rng_b.normal(size=(2, dim, dim)).astype(np.float32))
    comps = jnp.asarray(
        rng_b.normal(size=(2 * num_rels, 2)).astype(np.float32))
    edges_aug = es.num_edges + num_nodes

    def _op(x, pack):
        m = pack[0]
        return rel_spmm_basis_merged_ad(
            m, x, bases, comps, compute_dtype=jnp.bfloat16
        ) + x @ w_self.astype(jnp.bfloat16)

    variants = {}
    for tok in args.variants.split(","):
        ch, k = (int(v) for v in tok.split(":"))
        merged = build_merged_layout(
            np.asarray(es.dst), np.asarray(es.src), np.asarray(es.rel),
            np.asarray(es.val), num_nodes, es.num_rels,
            row_block=128, chunk=ch, dedup_k=k,
        )
        slots = (
            merged.fwd_dedup.src_sorted.shape[0]
            if merged.fwd_dedup is not None
            else merged.layout.perm.shape[0]
        )
        variants[f"ch{ch}_k{k}"] = (
            (jax.tree.map(jnp.asarray, merged),), slots
        )
        print(f"variant ch={ch} k={k}: {slots} slots", flush=True)

    # draw search per variant: short-chain rank, then a long re-measure of
    # EVERY draw (the spread itself is the quantity under test)
    chosen = {}
    draw_tables = {}
    for name, (pack, slots) in variants.items():
        draws = []
        for i in range(args.draws):
            step = bench._make_step(_op).lower(x, pack).compile()
            est = bench._measure_step(step, x, pack, 60, passes=1)
            long = bench._measure_step(step, x, pack, args.iters, passes=2)
            draws.append((long, est, step))
            print(f"  [{name}] draw {i}: est {est * 1e3:.3f} ms, "
                  f"long {long * 1e3:.3f} ms "
                  f"({long / slots * 1e9:.2f} ns/row)", flush=True)
        draws.sort(key=lambda d: d[0])
        chosen[name] = draws[0][2]
        draw_tables[name] = [round(d[0] * 1e3, 3) for d in draws]

    # interleaved long chains across each variant's best draw
    best = {name: float("inf") for name in variants}
    for rnd in range(args.rounds):
        for name in variants:
            pack = variants[name][0]
            dt = bench._measure_step(
                chosen[name], x, pack, args.iters, passes=1
            )
            best[name] = min(best[name], dt)
            print(f"  [round {rnd}] {name}: {dt * 1e3:.3f} ms "
                  f"(best {best[name] * 1e3:.3f})", flush=True)

    out = {"what": "probe_k_variants", "edges_aug": int(edges_aug)}
    for name, (pack, slots) in variants.items():
        dt = best[name]
        out[name] = {
            "slots": int(slots),
            "best_ms": round(dt * 1e3, 3),
            "ns_per_row": round(dt / slots * 1e9, 2),
            "gbps": round(slots * dim * 2 / dt / 1e9, 1),
            "edges_per_s": round(edges_aug / dt / 1e6, 1),
            "draw_long_ms": draw_tables[name],
        }
    if canary:
        from rgcn_tpu.utils.canary import measure_canary

        canary["after"] = measure_canary(tag="after")
        out["canary"] = canary
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
