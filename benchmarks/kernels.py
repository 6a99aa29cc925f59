#!/usr/bin/env python
"""Per-decomposition kernel benchmark: one JSON line per (variant, dtype).

Measures the forward relational-SpMM op (including the dense self-loop
term) for every weight layout the framework ships, on the WN18-scale
workload, with the async-chain methodology (see bench.py):

* ``dense-xla`` / ``dense-pallas-v1`` / ``dense-fused`` — full per-relation
  matrices (the bench.py headline ladder)
* ``basis`` — aggregation-first basis kernel (ops/pallas_basis.py), the
  reference's actual WN18 configuration (num_bases=2)
* ``diag`` — permute-free diagonal kernel (ops/pallas_diag.py), the e-RGCN
  first layer
* ``block`` — block-diagonal messages (XLA tile einsum — 2x2 blocks are
  VPU-shaped work that XLA fuses into the gather) + Pallas sorted
  aggregation, the FB-toy configuration (num_blocks=100)

Usage: python benchmarks/kernels.py [--quick] [--cpu] [--only SUBSTR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    # >= 60 chained iterations: sub-ms ops under-measure on shorter
    # chains (estimator inside RPC jitter — see CLAUDE.md)
    ap.add_argument("--iters", type=int, default=60)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        from rgcn_tpu.utils.compile_cache import enable

        enable()

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import _chained_time, build_workload
    from rgcn_tpu.graph.structure import build_edge_set
    from rgcn_tpu.ops.pallas_aggregate import build_dst_layout
    from rgcn_tpu.ops.spmm import rel_spmm, rel_spmm_block, rel_spmm_diag
    from rgcn_tpu.ops.pallas_aggregate import aggregate_messages_ad
    from rgcn_tpu.ops.pallas_basis import rel_spmm_basis_ad
    from rgcn_tpu.ops.pallas_diag import rel_spmm_diag_ad
    from rgcn_tpu.ops.pallas_fused import build_fused_layout, rel_spmm_fused
    from rgcn_tpu.ops.pallas_spmm import rel_spmm_pallas_full

    triples, num_nodes, num_rels, dim = build_workload(args.quick)
    on_tpu = jax.default_backend() in ("tpu", "axon")
    es = build_edge_set(triples, num_nodes, num_rels, tile_size=512,
                        with_dst_layout=True)
    # basis/diag run best at a smaller aggregation row block (no relation
    # runs to fragment): rb=128 swept optimum
    lay128 = build_dst_layout(np.asarray(es.dst), num_nodes,
                              row_block=128, chunk=256)
    rlay128 = build_dst_layout(np.asarray(es.reverse.dst), num_nodes,
                               row_block=128, chunk=256)
    es128 = dataclasses.replace(
        es, layout=lay128,
        reverse=dataclasses.replace(es.reverse, layout=rlay128),
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(num_nodes, dim)).astype(np.float32))
    w = jnp.asarray(
        rng.normal(size=(2 * num_rels + 1, dim, dim)).astype(np.float32)
    )
    nb = 2
    bases = jnp.asarray(rng.normal(size=(nb, dim, dim)).astype(np.float32))
    comps = jnp.asarray(rng.normal(size=(2 * num_rels, nb)).astype(np.float32))
    dw = jnp.asarray(rng.normal(size=(2 * num_rels + 1, dim)).astype(np.float32))
    n_blocks = 100 if dim % 100 == 0 else 8
    ib = dim // n_blocks
    blocks = jnp.asarray(
        rng.normal(size=(2 * num_rels, n_blocks, ib, ib)).astype(np.float32)
    )
    edges_aug = es.num_edges + num_nodes

    fl = build_fused_layout(es, row_block=512, chunk=512, quantum=32)

    from rgcn_tpu.graph.coalesce import build_merged_layout
    from rgcn_tpu.ops.pallas_basis import (
        _sorted_inputs,
        rel_spmm_basis_merged_ad,
        weighted_aggregate_pallas,
    )

    def _merged(rb, ch):
        m = build_merged_layout(
            np.asarray(es.dst), np.asarray(es.src), np.asarray(es.rel),
            np.asarray(es.val), num_nodes, es.num_rels,
            row_block=rb, chunk=ch,
        )
        return jax.tree.map(jnp.asarray, m)

    def _merged_op(rb, ch, input_fusion=True):  # fused = production default
        # returns a THUNK so layouts build only for variants that survive
        # the --only filter (each build + device upload costs seconds)
        def make():
            # the ~19 MB coeff matrix rides the w pytree (jit argument,
            # not a closure constant — remote-compile request size limit)
            w_val = (w, _merged(rb, ch))

            def op(x, wv):
                w_arr, m = wv
                return (
                    rel_spmm_basis_merged_ad(m, x, bases, comps,
                                             compute_dtype=jnp.bfloat16,
                                             input_fusion=input_fusion)
                    + x @ w_arr[-1].astype(jnp.bfloat16)
                )

            return op, w_val

        return ("lazy", make)

    def _basis_agg(x, out_dtype):
        src_sorted, wvec = _sorted_inputs(es128, comps)
        xg = x.astype(jnp.bfloat16)[src_sorted]
        agg = weighted_aggregate_pallas(
            xg, wvec, es128.layout, es128.num_nodes,
            compute_dtype=jnp.bfloat16, out_dtype=out_dtype,
        )
        return jnp.einsum("bni,bio->no", agg, bases.astype(jnp.bfloat16))

    variants = {
        "dense-xla": lambda x, w: rel_spmm(es, x, w[:-1]) + x @ w[-1],
        "dense-pallas-v1": lambda x, w: (
            rel_spmm_pallas_full(es, es.layout, x, w[:-1],
                                 compute_dtype=jnp.bfloat16)
            + x @ w[-1].astype(jnp.bfloat16)
        ),
        "dense-pallas-v1-infuse": lambda x, w: (
            rel_spmm_pallas_full(es, es.layout, x, w[:-1],
                                 compute_dtype=jnp.bfloat16,
                                 input_fusion=True)
            + x @ w[-1].astype(jnp.bfloat16)
        ),
        "dense-fused": lambda x, w: (
            rel_spmm_fused(fl, num_nodes, x, w[:-1],
                           compute_dtype=jnp.bfloat16)
            + x @ w[-1].astype(jnp.bfloat16)
        ),
        "dense-fused-nofuse": lambda x, w: (
            rel_spmm_fused(fl, num_nodes, x, w[:-1],
                           compute_dtype=jnp.bfloat16, input_fusion=False)
            + x @ w[-1].astype(jnp.bfloat16)
        ),
        "basis-bf16": lambda x, w: (
            rel_spmm_basis_ad(es128, x, bases, comps,
                              compute_dtype=jnp.bfloat16)
            + x @ w[-1].astype(jnp.bfloat16)
        ),
        # coalesced-pair layouts (graph/coalesce.py) at several
        # (row_block, chunk) points — the headline path. Unsuffixed
        # entries measure the PRODUCTION configuration (gather
        # input-fusion on, like the library defaults and bench.py);
        # '-nofuse' variants isolate the fusion contribution.
        "basis-merged-bf16": _merged_op(128, 256),
        "basis-merged-bf16-ch128": _merged_op(128, 128),
        "basis-merged-bf16-rb256": _merged_op(256, 256),
        "basis-merged-bf16-nofuse": _merged_op(128, 256, input_fusion=False),
        "basis-merged-bf16-ch128-nofuse": _merged_op(
            128, 128, input_fusion=False
        ),
        "basis-merged-bf16-rb256-nofuse": _merged_op(
            256, 256, input_fusion=False
        ),
        "basis-merged-bf16-ch64": _merged_op(128, 64),
        "basis-merged-bf16-rb64ch128": _merged_op(64, 128),
        "basis-merged-bf16-rb64ch64": _merged_op(64, 64),
        # ablation: the f32 aggregate (production materializes it bf16 —
        # measured 1.43 vs 1.38 ms; the in-kernel basis-matmul fold
        # measured 1.55 ms and was removed)
        "basis-bf16-aggf32": lambda x, w: (
            _basis_agg(x, jnp.float32) + x @ w[-1].astype(jnp.bfloat16)
        ),
        "basis-f32": lambda x, w: (
            rel_spmm_basis_ad(es128, x, bases, comps, compute_dtype=None)
            + x @ w[-1]
        ),
        "diag": lambda x, w: rel_spmm_diag_ad(es128, x, dw[:-1]) + x * dw[-1],
        # bf16 messages (the layer's on-TPU default): halves the dominant
        # (L, d) message materialization
        "diag-bf16": lambda x, w: (
            rel_spmm_diag_ad(es128, x, dw[:-1], compute_dtype=jnp.bfloat16)
            + x * dw[-1]
        ),
        "block": lambda x, w: (
            rel_spmm_block(es, x, blocks, aggregate=aggregate_messages_ad)
            + x @ w[-1]
        ),
        # the production block path: expand to dense per-relation matrices
        # and ride the dense Pallas kernel (see RGCNConv._block_messages)
        "block-expanded": lambda x, w: (
            rel_spmm_pallas_full(
                es, es.layout, x, _expand_blocks(blocks),
                compute_dtype=jnp.bfloat16,
            )
            + x @ w[-1].astype(jnp.bfloat16)
        ),
    }

    def _expand_blocks(blocks):
        r, nb_, ib_, ob_ = blocks.shape
        din_, dout_ = nb_ * ib_, nb_ * ob_
        rows = jnp.arange(din_)
        cols = (rows // ib_)[:, None] * ob_ + jnp.arange(ob_)[None, :]
        w_d = jnp.zeros((r, din_, dout_), blocks.dtype)
        return w_d.at[:, rows[:, None], cols].set(
            blocks.reshape(r, din_, ob_)
        )
    if not on_tpu:
        # compiled Pallas needs the chip; keep the portable oracle only
        variants = {k: v for k, v in variants.items() if k == "dense-xla"}

    for name, op in variants.items():
        if args.only and args.only not in name:
            continue
        w_val = w
        if isinstance(op, tuple):  # ("lazy", thunk) -> build on demand
            op, w_val = op[1]()
        try:
            dt = _chained_time(op, x, w_val, args.iters)
            print(json.dumps({
                "variant": name,
                "ms_per_op": round(dt * 1e3, 3),
                "edges_per_s": round(edges_aug / dt, 1),
            }), flush=True)
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            print(json.dumps({"variant": name, "error": repr(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
