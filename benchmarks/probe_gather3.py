#!/usr/bin/env python
"""Round-2 gather probes, part 3: confirm + tune e-split-srcsort.

probe_gather2.py found: per-feature-block (<=128-column) gathers + a
src-secondary-sorted aggregation layout run the edge stage at 0.91 ms vs
1.33 ms monolithic. Here:

* reproducibility (re-measure both, interleaved)
* the FULL basis op (edge stage + nb matmuls + self-loop) for the headline
* chunk=128 vs 256 under the src-sorted layout
* bias+relu fused onto the gathered rows (the model path gathers from
  embedding parameter blocks and applies the input activation per block —
  does the elementwise epilogue kill the fast gather emitter?)
* split geometry: (128, 72) vs (104, 96)

Usage: python benchmarks/probe_gather3.py [--iters N] [--only SUBSTR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from probe_gather2 import chained_time  # noqa: E402


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
    from rgcn_tpu.ops.pallas_aggregate import DstLayout, build_dst_layout
    from rgcn_tpu.ops.pallas_basis import (
        _sorted_inputs,
        weighted_aggregate_pallas,
    )

    triples, num_nodes, num_rels, dim = build_workload(False)
    es = build_edge_set(triples, num_nodes, num_rels, tile_size=512,
                        with_dst_layout=True)

    def build_srcsorted(dst, src, row_block=128, chunk=256):
        dst = np.asarray(dst)
        src = np.asarray(src)
        e = dst.shape[0]
        nrb = -(-num_nodes // row_block)
        keep = dst < num_nodes
        idx = np.nonzero(keep)[0]
        blk = dst[idx] // row_block
        order = idx[np.lexsort((src[idx], blk))]
        dst_sorted = dst[order]
        block_of = dst_sorted // row_block
        counts = np.bincount(block_of, minlength=nrb)
        padded = np.maximum(-(-counts // chunk), 1) * chunk
        offsets = np.concatenate([[0], np.cumsum(padded)])[:-1]
        starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
        total = max(int(padded.sum()), chunk)
        pos = offsets[block_of] + (np.arange(order.shape[0]) - starts[block_of])
        perm = np.full(total, e, dtype=np.int32)
        perm[pos] = order
        local = np.full(total, row_block, dtype=np.int32)
        local[pos] = dst_sorted - block_of * row_block
        n_chunks = total // chunk
        chunk_block = np.searchsorted(
            np.cumsum(padded), np.arange(n_chunks) * chunk, side="right"
        )
        chunk_block = np.minimum(chunk_block, nrb - 1).astype(np.int32)
        return DstLayout(
            perm=perm.astype(np.int32),
            local_dst=local.reshape(n_chunks, chunk),
            chunk_block=chunk_block,
            num_row_blocks=int(nrb),
            row_block=int(row_block),
            chunk=int(chunk),
        )

    lay = build_dst_layout(np.asarray(es.dst), num_nodes,
                           row_block=128, chunk=256)
    lay_ss = build_srcsorted(np.asarray(es.dst), np.asarray(es.src))
    lay_ss128 = build_srcsorted(np.asarray(es.dst), np.asarray(es.src),
                                chunk=128)

    nb = 2
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(num_nodes, dim)).astype(np.float32))
    comps = jnp.asarray(rng.normal(size=(2 * num_rels, nb)).astype(np.float32))
    bases_b = jnp.asarray(
        rng.normal(size=(nb, dim, dim)).astype(np.float32)
    ).astype(jnp.bfloat16)
    wself = jnp.asarray(
        rng.normal(size=(dim, dim)).astype(np.float32)
    ).astype(jnp.bfloat16)
    bias = jnp.asarray(rng.normal(size=(1, dim)).astype(np.float32))

    def inputs_for(es_lay):
        es2 = dataclasses.replace(es, layout=es_lay)
        ss, wv = _sorted_inputs(es2, comps)
        return jax.device_put(ss), jax.device_put(wv)

    ss_base, wv_base = inputs_for(lay)
    ss_ss, wv_ss = inputs_for(lay_ss)
    ss_ss128, wv_ss128 = inputs_for(lay_ss128)

    xb = x.astype(jnp.bfloat16)
    edges_aug = es.num_edges + num_nodes
    L = int(ss_ss.shape[0])
    eps = jnp.asarray(1e-3, jnp.bfloat16)

    def split_cols(widths):
        outs, c = [], 0
        for wd in widths:
            outs.append(jax.device_put(np.asarray(xb[:, c:c + wd])))
            c += wd
        return tuple(outs)

    x_128_72 = split_cols((128, 72))
    x_104_96 = split_cols((104, 96))
    bias_b = bias.astype(jnp.bfloat16)
    b_128_72 = (bias_b[:, :128], bias_b[:, 128:])

    def _mix(y, contrib):
        return y + contrib.astype(y.dtype) * eps

    probes = {}

    def make_edge_stage(ss, wv, la):
        def mono(y):
            xg = y[ss]
            agg = weighted_aggregate_pallas(
                xg, wv, la, num_nodes, compute_dtype=jnp.bfloat16
            )
            return _mix(y, agg.sum(axis=0)[:num_nodes])

        return mono

    def make_split_stage(ss, wv, la, act=False, biases=None):
        def split(ys):
            outs = []
            for i, y in enumerate(ys):
                g = y[ss]
                if act:
                    g = jax.nn.relu(g + biases[i])
                a = weighted_aggregate_pallas(
                    g, wv, la, num_nodes, compute_dtype=jnp.bfloat16
                )
                outs.append(_mix(y, a.sum(axis=0)[:num_nodes]))
            return tuple(outs)

        return split

    # interleave mono and split twice for reproducibility
    probes["e-mono-a"] = (make_edge_stage(ss_base, wv_base, lay), xb)
    probes["e-split-ss-a"] = (make_split_stage(ss_ss, wv_ss, lay_ss), x_128_72)
    probes["e-mono-b"] = (make_edge_stage(ss_base, wv_base, lay), xb)
    probes["e-split-ss-b"] = (make_split_stage(ss_ss, wv_ss, lay_ss), x_128_72)
    probes["e-split-ss-ch128"] = (
        make_split_stage(ss_ss128, wv_ss128, lay_ss128), x_128_72
    )
    probes["e-split-ss-104-96"] = (
        make_split_stage(ss_ss, wv_ss, lay_ss), x_104_96
    )
    probes["e-split-ss-relu"] = (
        make_split_stage(ss_ss, wv_ss, lay_ss, act=True, biases=b_128_72),
        x_128_72,
    )

    # full basis op, split path: per-block agg -> summed einsum + self-loop
    widths = (128, 72)

    def full_split(ys):
        outs = []
        aggs = []
        for y in ys:
            g = y[ss_ss]
            aggs.append(
                weighted_aggregate_pallas(
                    g, wv_ss, lay_ss, num_nodes, compute_dtype=jnp.bfloat16
                )
            )
        xcat_cols = 0
        out = None
        for i, a in enumerate(aggs):
            wslice = bases_b[:, xcat_cols:xcat_cols + widths[i], :]
            t = jnp.einsum("bni,bio->no", a.astype(jnp.bfloat16), wslice)
            out = t if out is None else out + t
            xcat_cols += widths[i]
        # self-loop: per-block matmul against w_self row slices
        c = 0
        for i, y in enumerate(ys):
            out = out + y @ wself[c:c + widths[i], :]
            c += widths[i]
        for i, y in enumerate(ys):
            outs.append(_mix(y, out[:, :widths[i]]))
        return tuple(outs)

    probes["full-split-ss"] = (full_split, x_128_72)

    def full_mono(y):
        xg = y[ss_base]
        agg = weighted_aggregate_pallas(
            xg, wv_base, lay, num_nodes, compute_dtype=jnp.bfloat16
        )
        out = jnp.einsum("bni,bio->no", agg.astype(jnp.bfloat16), bases_b)
        out = out + y @ wself
        return _mix(y, out)

    probes["full-mono"] = (full_mono, xb)

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
