#!/usr/bin/env python
"""Round-2 gather probes, part 4: clamp-free gathers + chunk-size trades.

The basis op's wall is the XLA row gather (~3.5 ns/row, latency-bound;
probe_gather2/3). Remaining micro-levers tested here, interleaved with the
baseline and long chains (60 iters — short chains jitter under fetch RPC):

* ``promise_in_bounds`` gather — every production index is in-bounds by
  construction (pad slots point at a zero edge whose src is 0), so the
  clamp arithmetic XLA emits for default (clip-mode) indexing is pure
  overhead.
* chunk 128 / 512 vs the default 256 — padding slots scale down with
  chunk (fewer gathered rows) while grid steps scale up (more per-step
  overhead).

Usage: python benchmarks/probe_gather4.py [--iters N] [--only SUBSTR]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=60)
    ap.add_argument("--only", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        from rgcn_tpu.utils.compile_cache import enable

        enable()

    import jax.numpy as jnp
    import numpy as np

    from bench import _chained_time, build_workload
    from rgcn_tpu.graph.structure import build_edge_set
    from rgcn_tpu.ops.pallas_aggregate import build_dst_layout
    from rgcn_tpu.ops.pallas_basis import (
        _sorted_inputs,
        weighted_aggregate_pallas,
    )

    triples, num_nodes, num_rels, dim = build_workload(args.cpu)
    es = build_edge_set(triples, num_nodes, num_rels, tile_size=512,
                        with_dst_layout=True)

    nb = 2
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(num_nodes, dim)).astype(np.float32))
    bases_b = jnp.asarray(
        rng.normal(size=(nb, dim, dim)).astype(np.float32)
    ).astype(jnp.bfloat16)
    wself = jnp.asarray(
        rng.normal(size=(dim, dim)).astype(np.float32)
    ).astype(jnp.bfloat16)
    comps = jnp.asarray(rng.normal(size=(2 * num_rels, nb)).astype(np.float32))

    def make_full(chunk, pib):
        lay = build_dst_layout(np.asarray(es.dst), num_nodes,
                               row_block=128, chunk=chunk)
        es_c = dataclasses.replace(es, layout=lay)
        ss, wv = _sorted_inputs(es_c, comps)
        L = int(ss.shape[0])

        def op(y, w):
            yb = y.astype(jnp.bfloat16)
            if pib:
                xg = yb.at[ss].get(mode="promise_in_bounds")
            else:
                xg = yb[ss]
            agg = weighted_aggregate_pallas(
                xg, wv, lay, num_nodes, compute_dtype=jnp.bfloat16,
                out_dtype=jnp.bfloat16,
            )
            out = jnp.einsum("bni,bio->no", agg, bases_b)
            return out + yb @ wself

        return op, L

    probes = {
        "full-base-a": make_full(256, False),
        "full-pib-a": make_full(256, True),
        "full-base-b": make_full(256, False),
        "full-pib-b": make_full(256, True),
        "full-pib-ch128": make_full(128, True),
        "full-pib-ch512": make_full(512, True),
    }

    edges_aug = es.num_edges + num_nodes
    w_dummy = jnp.zeros((1, 1), jnp.float32)
    for name, (fn, L) in probes.items():
        if args.only and args.only not in name:
            continue
        try:
            dt = _chained_time(fn, x, w_dummy, args.iters)
            print(json.dumps({
                "probe": name,
                "ms": round(dt * 1e3, 3),
                "slots": L,
                "ns_per_slot": round(dt / L * 1e9, 2),
                "edges_per_s": round(edges_aug / dt, 1),
            }), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"probe": name, "error": repr(e)[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
