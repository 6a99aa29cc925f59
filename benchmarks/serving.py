#!/usr/bin/env python
"""Serving throughput: encode-once DistMult ranking QPS at WN18 scale.

Measures `LinkPredictionServer.topk_tails` end to end — host query batch
in, `(B, k)` results back on the host — across batch-size buckets, plus
the one-time encode cost. One JSON line per configuration.

NOTE on this container: every call pays the tunneled backend's ~20-25 ms
host<->device RPC, which dominates small batches; on a local TPU that
term is PCIe-sized. Large batches amortize it, so the `queries_per_s`
column at B>=256 approximates real serving throughput while B=1 reports
tunnel-bound request latency.

Usage: python benchmarks/serving.py [--quick] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--calls", type=int, default=20)
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        from rgcn_tpu.utils.compile_cache import enable

        enable()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import build_workload
    from rgcn_tpu.graph.structure import build_edge_set
    from rgcn_tpu.models import LinkPredictor
    from rgcn_tpu.serve import LinkPredictionServer

    triples, num_nodes, num_rels, dim = build_workload(args.quick)
    # the reference WN18 configuration (basis nb=2) with merged layout
    edges = build_edge_set(
        triples, num_nodes, num_rels, tile_size=512,
        with_dst_layout=True, with_merged_layout=True,
    )
    model = LinkPredictor(
        num_nodes=num_nodes, num_relations=num_rels, emb_dim=dim,
        hidden1_size=dim, num_layers=1, decomposition="basis", num_bases=2,
        weight_init="schlichtkrull-normal", bias_init="zeros",
        decoder_l2_type="schlichtkrull-l2", decoder_l2=0.01,
    )
    batch0 = jnp.asarray(triples[:64])
    params = model.init({"params": jax.random.key(0)}, edges, batch0)

    t0 = time.perf_counter()
    srv = LinkPredictionServer(
        model, params, edges, max_batch=1024, known_triples=triples
    )
    np.asarray(srv.z)  # force the encode to finish
    encode_s = time.perf_counter() - t0
    print(json.dumps({
        "metric": "serving_encode_once_s",
        "value": round(encode_s, 3),
        "num_nodes": num_nodes,
    }), flush=True)

    rng = np.random.default_rng(0)
    for filtered in (False, True):
        for bsz in (1, 16, 256, 1024):
            sp = np.stack(
                [rng.integers(0, num_nodes, bsz),
                 rng.integers(0, num_rels, bsz)],
                axis=1,
            )
            srv.topk_tails(sp, k=10, filtered=filtered)  # warm this bucket
            t0 = time.perf_counter()
            for _ in range(args.calls):
                srv.topk_tails(sp, k=10, filtered=filtered)
            dt = (time.perf_counter() - t0) / args.calls
            print(json.dumps({
                "metric": "serving_topk_tails",
                "filtered": filtered,
                "batch": bsz,
                "ms_per_call": round(dt * 1e3, 2),
                "queries_per_s": round(bsz / dt, 1),
                "candidates": num_nodes,
            }), flush=True)


if __name__ == "__main__":
    main()
