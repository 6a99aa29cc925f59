#!/usr/bin/env python
"""Hub-remap probe for the merged basis forward's source gather.

The bench workload's zipf structure concentrates sources: the top-128 hub
nodes cover ~37% of merged slots (top-1024: ~60%). If the XLA row gather's
per-row cost tracks the table's *hot working set* (probe_gather5 measured
~2.6 ns/row from a 33 MB table vs ~15 ns/row from 240 MB), then remapping
hub sources into a small prefix table — ``xcat = [x[hubs] ; x]`` with
host-remapped slot indices — should cut the gather portion for the hub
fraction. Exact: the gathered rows are identical.

Same-process A/B, >=100-iteration chains (CLAUDE.md measurement rules).

    python benchmarks/probe_hub.py [--iters 100]
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
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--chunk", type=int, default=128)
    args = ap.parse_args()

    from rgcn_tpu.utils.compile_cache import enable

    enable()

    import jax
    import jax.numpy as jnp

    from rgcn_tpu.data.synthetic import synthetic_kg
    from rgcn_tpu.graph.coalesce import build_merged_layout
    from rgcn_tpu.graph.structure import build_edge_set
    from rgcn_tpu.ops.pallas_basis import weighted_aggregate_pallas

    num_nodes, num_rels, num_edges, dim, nb = 40_943, 18, 146_500, 200, 2
    triples = synthetic_kg(num_nodes, num_rels, num_edges, seed=0,
                           reciprocity=0.9)
    es = build_edge_set(triples, num_nodes, num_rels, tile_size=512,
                        with_dst_layout=False)
    merged = build_merged_layout(
        np.asarray(es.dst), np.asarray(es.src), np.asarray(es.rel),
        np.asarray(es.val), num_nodes, es.num_rels,
        row_block=128, chunk=args.chunk,
    )
    L = merged.layout.perm.shape[0]
    print(f"slots={L} pairs={merged.num_pairs}", file=sys.stderr, flush=True)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(num_nodes, dim)).astype(np.float32))
    bases = jnp.asarray(rng.normal(size=(nb, dim, dim)).astype(np.float32))
    comps = jnp.asarray(
        rng.normal(size=(2 * num_rels, nb)).astype(np.float32)
    )
    w_self = jnp.asarray(rng.normal(size=(dim, dim)).astype(np.float32))

    # precomputed per-slot weights (forward-only probe; wvec is comps-
    # dependent in training but constant here)
    coeffj = jnp.asarray(merged.coeff)
    wvec = jnp.einsum("lr,rb->bl", coeffj, comps,
                      preferred_element_type=jnp.float32,
                      precision="highest")
    src_base = np.asarray(merged.src_sorted)

    def make_remap(H):
        # hub ids by slot frequency (only REAL slots matter; pads point at 0
        # with zero coeff — remap keeps them wherever they land)
        cnt = np.bincount(src_base, minlength=num_nodes)
        hubs = np.argsort(cnt)[::-1][:H].astype(np.int32)
        pos = np.full(num_nodes, -1, np.int64)
        pos[hubs] = np.arange(H)
        p = pos[src_base]
        remap = np.where(p >= 0, p, src_base.astype(np.int64) + H)
        frac = float((p >= 0).mean())
        print(f"H={H}: hub slot fraction {frac:.3f}", file=sys.stderr,
              flush=True)
        return jnp.asarray(hubs), jnp.asarray(remap.astype(np.int32))

    lay = merged.layout

    def chain(step, ops, iters):
        def sync(y):
            float(y[0, 0])

        def measure(k):
            y = step(x, ops)
            sync(y)
            ts = []
            for _ in range(3):
                y = x
                t0 = time.perf_counter()
                for _ in range(k):
                    y = step(y, ops)
                sync(y)
                ts.append(time.perf_counter() - t0)
            return min(ts)

        return (measure(2 + iters) - measure(2)) / iters

    results = {}

    # baseline: the production merged forward shape
    @jax.jit
    def step_base(x, ops):
        wvec_, src_, ws = ops
        xc = x.astype(jnp.bfloat16)
        xg = xc[src_]
        agg = weighted_aggregate_pallas(
            xg, wvec_, lay, num_nodes, compute_dtype=jnp.bfloat16,
            out_dtype=jnp.bfloat16, input_fusion=True,
        )
        out = jnp.einsum("bni,bio->no", agg, bases.astype(jnp.bfloat16))
        out = out + x.astype(jnp.bfloat16) @ ws.astype(jnp.bfloat16)
        return x + out.astype(x.dtype) * jnp.asarray(1e-9, x.dtype)

    ops_base = (wvec, jnp.asarray(src_base), w_self)
    results["base_ms"] = chain(step_base, ops_base, args.iters) * 1e3
    print(f"base: {results['base_ms']:.3f} ms", file=sys.stderr, flush=True)

    for H in (512, 2048, 8192):
        hubs, remap = make_remap(H)

        @jax.jit
        def step_hub(x, ops, _H=H):
            wvec_, remap_, hubs_, ws = ops
            xc = x.astype(jnp.bfloat16)
            xcat = jnp.concatenate([xc[hubs_], xc], axis=0)
            xg = xcat[remap_]
            agg = weighted_aggregate_pallas(
                xg, wvec_, lay, num_nodes, compute_dtype=jnp.bfloat16,
                out_dtype=jnp.bfloat16, input_fusion=True,
            )
            out = jnp.einsum("bni,bio->no", agg, bases.astype(jnp.bfloat16))
            out = out + x.astype(jnp.bfloat16) @ ws.astype(jnp.bfloat16)
            return x + out.astype(x.dtype) * jnp.asarray(1e-9, x.dtype)

        ops_hub = (wvec, remap, hubs, w_self)
        dt = chain(step_hub, ops_hub, args.iters) * 1e3
        results[f"hub{H}_ms"] = dt
        print(f"hub H={H}: {dt:.3f} ms", file=sys.stderr, flush=True)

    # re-measure base in the same process (drift guard)
    results["base2_ms"] = chain(step_base, ops_base, args.iters) * 1e3

    print(json.dumps({k: round(v, 3) for k, v in results.items()}))


if __name__ == "__main__":
    main()
