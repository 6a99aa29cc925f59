#!/usr/bin/env python
"""Bisect the structured-decoder BACKWARD (probe_lp_step.py pins it at
~16-17 ms of the 26 ms WN18-scale LP step). Chained timings of isolated
pieces at production shapes:

    python benchmarks/probe_lp_bwd.py [--iters 60]
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
    ap.add_argument("--iters", type=int, default=60)
    args = ap.parse_args()

    from rgcn_tpu.utils.compile_cache import enable

    enable()

    import jax
    import jax.numpy as jnp

    from rgcn_tpu.ops.pallas_aggregate import aggregate_presorted_pallas
    from rgcn_tpu.ops.pallas_distmult import (
        build_structured_layouts,
        distmult_structured_agg_ad,
    )

    N, P, ns, d, R = 40943, 30000, 10, 200, 18
    B = P * (1 + ns)
    rng = np.random.default_rng(0)
    pos_np = np.stack(
        [rng.integers(0, N, P), rng.integers(0, R, P),
         rng.integers(0, N, P)], axis=1,
    )
    ce_np = rng.integers(0, N, P * ns)
    ch_np = rng.random(P * ns) < 0.5
    lays = build_structured_layouts(pos_np, ce_np, N)
    lays_sorted = build_structured_layouts(
        pos_np, ce_np, N, sorted_corrupt=True, corrupt_head=ch_np
    )
    c_lay = lays[0]

    nodes = jnp.asarray(rng.normal(size=(N, d)).astype(np.float32))
    rel = jnp.asarray(rng.normal(size=(R, d)).astype(np.float32))
    pw = jnp.full((B,), 1.0 / B, jnp.float32)
    pos = jnp.asarray(pos_np)
    ch_ = jnp.asarray(ch_np)
    ce_ = jnp.asarray(ce_np)
    g_scores = jnp.asarray(
        rng.normal(size=(B,)).astype(np.float32) / B
    )
    rows_big = jnp.asarray(
        rng.normal(size=(P * ns, d)).astype(np.float32)
    )
    zc3 = jnp.asarray(
        rng.normal(size=(P, ns, d)).astype(np.float32)
    )
    q = jnp.asarray(rng.normal(size=(P, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(P, d)).astype(np.float32))

    def chain(fn, x0, iters=args.iters):
        jitted = jax.jit(fn)

        def sync(y):
            # device-side scalar slice, 4-byte fetch — pulling the whole
            # tensor over the tunnel (~20 MB/s) would swamp the estimate
            float(y.reshape(-1)[0])

        def measure(kk):
            y = jitted(x0)
            sync(y)
            ts = []
            for _ in range(3):
                y = x0
                t0 = time.perf_counter()
                for _ in range(kk):
                    y = jitted(y)
                sync(y)
                ts.append(time.perf_counter() - t0)
            return min(ts)

        return (measure(2 + iters) - measure(2)) / iters

    results = {}

    # (a) full structured VJP at production scale (scores cotangent only)
    def full_vjp(x):
        def f(nodes_, rel_):
            sc, pen = distmult_structured_agg_ad(
                pos, ch_, ce_, nodes_, rel_, pw, lays
            )
            return jnp.vdot(sc, g_scores) + 0.01 * pen

        gn, gr = jax.grad(f, argnums=(0, 1))(x, rel)
        return x + gn * 1e-9 + jnp.sum(gr) * 1e-12

    results["structured_vjp_ms"] = chain(full_vjp, nodes) * 1e3

    # (a') the v3 SORTED VJP (weighted in-pipeline-gather aggregations)
    def full_vjp_sorted(x):
        def f(nodes_, rel_):
            sc, pen = distmult_structured_agg_ad(
                pos, ch_, ce_, nodes_, rel_, pw, lays_sorted
            )
            return jnp.vdot(sc, g_scores) + 0.01 * pen

        gn, gr = jax.grad(f, argnums=(0, 1))(x, rel)
        return x + gn * 1e-9 + jnp.sum(gr) * 1e-12

    results["structured_vjp_sorted_ms"] = chain(full_vjp_sorted, nodes) * 1e3

    # (a'') v3 pieces: one weighted aggregation gathering from a COMPUTED
    # (2P, d) table vs from the nodes INPUT table (the backward's two
    # kernel passes, isolated)
    from rgcn_tpu.ops.pallas_basis import weighted_aggregate_pallas

    ce_sorted, qk_idx = lays_sorted[3]
    wsort = jnp.asarray(
        rng.normal(size=(1, c_lay.perm.shape[0])).astype(np.float32) / B
    )
    qk_idx_j = jnp.asarray(qk_idx)
    ce_sorted_j = jnp.asarray(ce_sorted)

    def wagg_qk(x):
        qk2 = jnp.concatenate([x[:P] * 1.0000001, x[:P] + 1e-7], axis=0)
        xg = qk2[qk_idx_j]
        out = weighted_aggregate_pallas(
            xg, wsort, c_lay, N, compute_dtype=None, input_fusion=True
        )[0]
        return x + out * 1e-9

    results["wagg_computed_qk_ms"] = chain(wagg_qk, nodes) * 1e3

    def wagg_nodes(x):
        xg = x[ce_sorted_j]
        out = weighted_aggregate_pallas(
            xg, wsort, c_lay, N, compute_dtype=None, input_fusion=True
        )[0]
        return x + out * 1e-9

    results["wagg_input_nodes_ms"] = chain(wagg_nodes, nodes) * 1e3

    # (a''') layout-geometry sweep for the sorted VJP: the default
    # rb=128/ch=256 layouts carry heavy block-minimum padding (every row
    # block gets >= 1 chunk, so the P=30k subject/object layouts are 73%
    # pads: 320 blocks x 256 + 30208 = 112k slots). Larger row blocks cut
    # the pad floor; one-hot flops grow with rb but the walls here are
    # per-slot.
    for rb, ch in ((256, 256), (512, 256), (512, 128), (1024, 128)):
        lays_g = build_structured_layouts(
            pos_np, ce_np, N, row_block=rb, chunk=ch,
            sorted_corrupt=True, corrupt_head=ch_np,
        )
        slots_c = lays_g[0].perm.shape[0]
        slots_p = lays_g[1].perm.shape[0]
        print(f"rb={rb} ch={ch}: c_lay {slots_c} slots, p_lay {slots_p}",
              file=sys.stderr, flush=True)

        def full_vjp_g(x, _lays=lays_g):
            def f(nodes_, rel_):
                sc, pen = distmult_structured_agg_ad(
                    pos, ch_, ce_, nodes_, rel_, pw, _lays
                )
                return jnp.vdot(sc, g_scores) + 0.01 * pen

            gn, gr = jax.grad(f, argnums=(0, 1))(x, rel)
            return x + gn * 1e-9 + jnp.sum(gr) * 1e-12

        results[f"vjp_sorted_rb{rb}_ch{ch}_ms"] = (
            chain(full_vjp_g, nodes) * 1e3
        )

    # (b) forward alone (same epilogue form)
    def fwd_only(x):
        sc, pen = distmult_structured_agg_ad(
            pos, ch_, ce_, x, rel, pw, lays
        )
        return x + (jnp.vdot(sc, g_scores) + 0.01 * pen) * 1e-9

    results["structured_fwd_ms"] = chain(fwd_only, nodes) * 1e3

    # (c) the corrupted-side aggregation alone: permute + kernel over
    # Ns-row layout (rows fixed input)
    def agg_c(x):
        rows_z = jnp.concatenate([x, jnp.zeros((1, d), x.dtype)], axis=0)
        srt = rows_z[jnp.asarray(c_lay.perm)]
        out = aggregate_presorted_pallas(srt, c_lay, N)
        return x.at[:N].add(out * 1e-9)

    results["agg_corrupt_ms"] = chain(agg_c, rows_big) * 1e3

    # (d) the 300k-row feature gather alone
    def gat(x):
        return x + x[ce_][: N] * 1e-9

    results["gather_300k_ms"] = chain(gat, nodes) * 1e3

    # (e) the (P, ns, d) elementwise+reduce pair (gzc_tail/head analogue)
    def gzc(x):
        chf = ch_.reshape(P, ns)[..., None].astype(x.dtype)
        gsn = g_scores[P:].reshape(P, ns)[..., None]
        t1 = jnp.sum((1.0 - chf) * gsn * x, axis=1)
        t2 = jnp.sum(chf * gsn * x, axis=1)
        return x + (t1 + t2)[:, None, :] * 1e-9

    results["gzc_reductions_ms"] = chain(gzc, zc3) * 1e3

    # (f) qk expansion + rows_c materialization analogue
    def rowsc(x):
        chb = ch_.reshape(P, ns)[..., None]
        qk = jnp.where(chb, k[:, None, :], q[:, None, :])
        gsn = g_scores[P:].reshape(P, ns)[..., None]
        rows = gsn * qk + 1e-4 * x
        return x + rows * 1e-9

    results["rows_c_build_ms"] = chain(rowsc, zc3) * 1e3

    for k_, v in results.items():
        results[k_] = round(v, 3)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
