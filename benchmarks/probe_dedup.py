#!/usr/bin/env python
"""Same-process A/B: merged basis op vs the K-lane source-dedup'd frame.

Measures the official bench op (forward incl. dense self-loop term) on
the WN18-scale reciprocity-faithful workload with >= 60-iteration chains
(CLAUDE.md measurement rules), printing one line per variant:

    python benchmarks/probe_dedup.py [--iters 100] [--variants ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument(
        "--variants", default="m256,m128,d4c256,d4c128,d2c256",
        help="comma list: m<chunk> = merged, d<K>c<chunk> = dedup",
    )
    args = ap.parse_args()

    from rgcn_tpu.utils.compile_cache import enable

    enable()

    import jax
    import jax.numpy as jnp

    from bench import _chained_time, build_workload
    from rgcn_tpu.graph.coalesce import build_merged_layout
    from rgcn_tpu.graph.structure import build_edge_set
    from rgcn_tpu.ops.pallas_basis import rel_spmm_basis_merged_ad

    triples, num_nodes, num_rels, dim = build_workload(False, reciprocity=0.9)
    es = build_edge_set(triples, num_nodes, num_rels, tile_size=512,
                        with_dst_layout=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(num_nodes, dim)).astype(np.float32))
    w_self = jnp.asarray(rng.normal(size=(dim, dim)).astype(np.float32))
    nb = 2
    rng_b = np.random.default_rng(1)
    bases = jnp.asarray(rng_b.normal(size=(nb, dim, dim)).astype(np.float32))
    comps = jnp.asarray(
        rng_b.normal(size=(2 * num_rels, nb)).astype(np.float32)
    )
    edges_aug = es.num_edges + num_nodes

    results = {}
    ref_out = None
    for spec in args.variants.split(","):
        spec = spec.strip()
        if spec.startswith("m"):
            ch, k = int(spec[1:]), 0
        else:
            kpart, cpart = spec[1:].split("c")
            k, ch = int(kpart), int(cpart)
        t0 = time.time()
        merged = build_merged_layout(
            np.asarray(es.dst), np.asarray(es.src), np.asarray(es.rel),
            np.asarray(es.val), num_nodes, es.num_rels,
            row_block=128, chunk=ch, dedup_k=k,
        )
        build_s = time.time() - t0
        slots = (
            merged.fwd_dedup.src_sorted.shape[0]
            if merged.fwd_dedup is not None
            else merged.layout.perm.shape[0]
        )
        md = jax.tree.map(jnp.asarray, merged)

        def op(x, wv):
            w_arr, m = wv
            return rel_spmm_basis_merged_ad(
                m, x, bases, comps, compute_dtype=jnp.bfloat16
            ) + x @ w_arr.astype(jnp.bfloat16)

        # numerics guard vs the first variant measured
        out = np.asarray(jax.jit(op)(x, (w_self, md))[:8, :8], np.float32)
        if ref_out is None:
            ref_out = out
        else:
            err = np.max(np.abs(out - ref_out) / (np.abs(ref_out) + 1.0))
            if err > 5e-2:
                print(f"{spec}: NUMERIC MISMATCH {err:.3e}", flush=True)
                continue

        dt = _chained_time(op, x, (w_self, md), args.iters, passes=2)
        results[spec] = dt
        print(
            f"{spec}: {dt * 1e3:.3f} ms/op ({edges_aug / dt / 1e6:.0f}M "
            f"edges/s) slots={slots} build={build_s:.2f}s",
            flush=True,
        )

    best = min(results, key=results.get)
    print(f"best: {best} {results[best] * 1e3:.3f} ms")


if __name__ == "__main__":
    main()
