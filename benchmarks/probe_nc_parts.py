#!/usr/bin/env python
"""Fine-grained attribution of the AM-scale NC layer costs.

probe_stress_nc.py showed the full step at ~3.7 s with layer-2 (featureful
basis, din=10 -> dout=11) the dominant term and layer-1 (featureless) at
~1.4 s forward — both orders of magnitude above their bandwidth floors
(~1 GB of gathered rows each). This probe times the PIECES on device:

  rows      — the wide (U, nb, dout) basis-row gather alone
  contract  — gather + per-pair contraction (no fan-out, no aggregation)
  fanout    — + the (E, dout) computed-table gather
  agg_pallas— + the Pallas sorted aggregation (the l1 forward)
  agg_xla   — same but XLA segment_sum aggregation
  msgs2_tile— layer-2 messages via per-tile einsum (current _dense_path)
  msgs2_H   — layer-2 messages via H = X @ bases precompute + pair gather

    python benchmarks/probe_nc_parts.py [--cpu] [--only agg]
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
    ap.add_argument("--nodes", type=int, default=300_000)
    ap.add_argument("--rels", type=int, default=266)
    ap.add_argument("--edges", type=int, default=1_000_000)
    ap.add_argument("--bases", type=int, default=40)
    ap.add_argument("--hidden", type=int, default=10)
    ap.add_argument("--classes", type=int, default=11)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--only", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        from rgcn_tpu.utils.compile_cache import enable

        enable()

    import jax
    import jax.numpy as jnp

    from rgcn_tpu.data.synthetic import synthetic_kg
    from rgcn_tpu.graph.structure import build_edge_set
    from rgcn_tpu.ops import spmm as spmm_ops
    from rgcn_tpu.ops.pallas_aggregate import aggregate_messages_ad

    n, r = args.nodes, args.rels
    nb, dh, dc = args.bases, args.hidden, args.classes

    triples = synthetic_kg(n, r, args.edges, seed=9)
    es = build_edge_set(
        triples, n, r, tile_size=512, with_dst_layout=True,
        with_pair_index=True,
    )
    pi = es.pairs
    print(f"parts: E_pad={es.src.shape[0]} U_pad={pi.pair_src.shape[0]} "
          f"tiles={es.num_tiles}", flush=True)

    rng = np.random.default_rng(0)
    bases1 = jnp.asarray(rng.normal(size=(nb, n, dh)).astype(np.float32))
    comps = jnp.asarray(rng.normal(size=(2 * r, nb)).astype(np.float32))
    bases2 = jnp.asarray(rng.normal(size=(nb, dh, dc)).astype(np.float32))
    x2 = jnp.asarray(rng.normal(size=(n, dh)).astype(np.float32))
    msgs_pre = jnp.asarray(
        rng.normal(size=(es.src.shape[0], dh)).astype(np.float32)
    )

    rows_by_node = jnp.swapaxes(bases1, 0, 1)  # (N, nb, dh)

    def timed(tag, fn, *fargs):
        if args.only and args.only not in tag:
            return
        f = jax.jit(fn)
        t0 = time.time()
        float(jnp.sum(f(*fargs)))
        compile_s = time.time() - t0
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = f(*fargs)
            float(jnp.sum(out))
            ts.append(time.perf_counter() - t0)
        ms = min(ts) / args.iters * 1e3
        results[tag] = round(ms, 1)
        print(f"  {tag}: {ms:.1f} ms (compile {compile_s:.1f}s)", flush=True)

    results = {}

    timed("rows", lambda t: t[pi.pair_src], rows_by_node)

    # 2-D contiguous-table forms of the same gather: is the 192 ms "rows"
    # cost the 3-D sliced gather (per-slice strided descriptors), fixable
    # by gathering 1600-B flat rows?
    table2d_input = jnp.asarray(
        np.ascontiguousarray(
            np.swapaxes(np.asarray(bases1), 0, 1)
        ).reshape(n, nb * dh)
    )
    timed("rows2d_input", lambda t: t[pi.pair_src], table2d_input)

    def rows2d_computed(b):
        t = jax.lax.optimization_barrier(
            jnp.swapaxes(b, 0, 1).reshape(n, nb * dh)
        )
        return t[pi.pair_src]

    timed("rows2d_computed", rows2d_computed, bases1)

    def rows2d_bf16(b):
        t = jax.lax.optimization_barrier(
            jnp.swapaxes(b, 0, 1).reshape(n, nb * dh).astype(jnp.bfloat16)
        )
        return t[pi.pair_src]

    timed("rows2d_bf16", rows2d_bf16, bases1)

    # aggregation geometry sweep: is the narrow-(E,10) aggregation cost
    # the per-grid-step overhead at nrb = N/128 = 2344 row blocks?
    from rgcn_tpu.ops.pallas_aggregate import build_dst_layout

    import dataclasses as _dc

    for rb_test, ch_test in ((512, 256), (2048, 256), (1024, 1024),
                             (2048, 1024), (512, 2048), (1024, 2048)):
        tag = f"agg_rb{rb_test}c{ch_test}_pre"
        if args.only and args.only not in tag:
            continue
        lay = jax.tree.map(
            jnp.asarray,
            build_dst_layout(np.asarray(es.dst), n, row_block=rb_test,
                             chunk=ch_test),
        )
        es_rb = _dc.replace(es, layout=lay)
        timed(
            tag,
            lambda m, es_: aggregate_messages_ad(m, es_),
            msgs_pre, es_rb,
        )
    timed(
        "contract",
        lambda t, c: jnp.einsum("ubo,ub->uo", t[pi.pair_src],
                                c[pi.pair_rel]),
        rows_by_node, comps,
    )

    def fanout(t, c, es_):
        m = jnp.einsum("ubo,ub->uo", t[pi.pair_src], c[pi.pair_rel])
        return m[pi.edge_pair] * es_.val[:, None]

    timed("fanout", fanout, rows_by_node, comps, es)
    timed(
        "agg_pallas",
        lambda t, c, es_: aggregate_messages_ad(fanout(t, c, es_), es_),
        rows_by_node, comps, es,
    )
    timed(
        "agg_xla",
        lambda t, c, es_: spmm_ops.aggregate_messages(
            fanout(t, c, es_), es_.dst, es_.num_nodes
        ),
        rows_by_node, comps, es,
    )
    timed(
        "agg_pallas_pre",
        lambda m, es_: aggregate_messages_ad(m, es_),
        msgs_pre, es,
    )
    timed(
        "agg_xla_pre",
        lambda m, es_: spmm_ops.aggregate_messages(
            m, es_.dst, es_.num_nodes
        ),
        msgs_pre, es,
    )

    # presorted pair fan-out: the fan-out gather + val weighting computed
    # inside the aggregation kernel's input pipeline (nb=1 weighted
    # aggregation over the computed pair-message table), replacing the
    # materialize→permute round trip
    from rgcn_tpu.ops.pallas_basis import weighted_aggregate_pallas

    perm_np = np.asarray(es.layout.perm)
    u_pad = pi.pair_src.shape[0]
    ep_z = np.append(np.asarray(pi.edge_pair), u_pad).astype(np.int32)
    ep_sorted = jnp.asarray(ep_z[perm_np])  # (L,) pads -> zero row of m_z
    table2d = table2d_input  # (N, nb*dh) contiguous

    def agg_pair_presorted(t, c, es_):
        rows = t[pi.pair_src].reshape(u_pad, nb, dh)
        m = jnp.einsum("ubo,ub->uo", rows, c[pi.pair_rel])
        m_z = jnp.concatenate([m, jnp.zeros((1, dh), m.dtype)], axis=0)
        val_z = jnp.concatenate(
            [es_.val, jnp.zeros((1,), es_.val.dtype)]
        )
        rows_sorted = m_z[ep_sorted]
        w = val_z[es_.layout.perm][None]
        return weighted_aggregate_pallas(
            rows_sorted, w, es_.layout, es_.num_nodes,
            compute_dtype=jnp.bfloat16, input_fusion=True,
        )[0]

    timed("l1_pair_presorted_full", agg_pair_presorted, table2d, comps, es)
    for rb_test, ch_test in ((512, 256), (1024, 1024)):
        tag = f"l1_pair_presorted_rb{rb_test}c{ch_test}"
        if args.only and args.only not in tag:
            continue
        lay = build_dst_layout(np.asarray(es.dst), n, row_block=rb_test,
                               chunk=ch_test)
        ep_s = jnp.asarray(ep_z[np.asarray(lay.perm)])
        lay_j = jax.tree.map(jnp.asarray, lay)
        es_rb = _dc.replace(es, layout=lay_j)

        def agg_pp(t, c, es_, ep_s=ep_s):
            rows = t[pi.pair_src].reshape(u_pad, nb, dh)
            m = jnp.einsum("ubo,ub->uo", rows, c[pi.pair_rel])
            m_z = jnp.concatenate([m, jnp.zeros((1, dh), m.dtype)], axis=0)
            val_z = jnp.concatenate(
                [es_.val, jnp.zeros((1,), es_.val.dtype)]
            )
            rows_sorted = m_z[ep_s]
            w = val_z[es_.layout.perm][None]
            return weighted_aggregate_pallas(
                rows_sorted, w, es_.layout, es_.num_nodes,
                compute_dtype=jnp.bfloat16, input_fusion=True,
            )[0]

        timed(tag, agg_pp, table2d, comps, es_rb)

    # layer-2 message stage variants (no aggregation)
    def msgs2_tile(x, b, c, es_):
        w = jnp.einsum("rb,bio->rio", c, b)  # (2R, dh, dc)
        tile, n_tiles = es_.tile_size, es_.num_tiles
        xg = x[es_.src].reshape(n_tiles, tile, dh)
        w_t = w[es_.tile_rel]
        return jnp.einsum("tbi,tio->tbo", xg, w_t).reshape(-1, dc)

    def msgs2_H(x, b, c, es_):
        h = jnp.einsum("ni,bio->nbo", x, b)  # (N, nb, dc)
        m = jnp.einsum("ubo,ub->uo", h[pi.pair_src], c[pi.pair_rel])
        return m[pi.edge_pair] * es_.val[:, None]

    timed("msgs2_tile", msgs2_tile, x2, bases2, comps, es)
    timed("msgs2_H", msgs2_H, x2, bases2, comps, es)
    timed(
        "l2_H_agg_pallas",
        lambda x, b, c, es_: aggregate_messages_ad(
            msgs2_H(x, b, c, es_), es_
        ),
        x2, bases2, comps, es,
    )

    print(json.dumps({"what": "probe_nc_parts", "nodes": n,
                      "E_pad": int(es.src.shape[0]),
                      "U_pad": int(pi.pair_src.shape[0]),
                      "ms": results}), flush=True)


if __name__ == "__main__":
    main()
