#!/usr/bin/env python
"""Device-time attribution of the AM-scale NC train step.

`benchmarks/stress_nc.py` reports epoch WALLS, which on the tunneled
backend track tunnel health, not device work (CLAUDE.md). This probe
measures the full-batch NC STEP program (featureless 40-basis layer 1 +
featureful basis layer 2, CE + layer-1 L2, adam) with device-resident
inputs via the async-chain method, across step variants (plain per-edge
vs pair pre-contraction, bf16 vs f32 gather tables, composed-vs-explicit
fan-out, forward-only / optimizer / penalty ablations, forward pieces).

**Methodology (round 7, hard-won): at this scale only INTERLEAVED chains
(--ab a,b,...) can compare variants.** A single chain spans tens of
seconds — long enough that cross-tenant congestion bursts on the
tunneled chip land entirely inside one variant's window: one-shot chains
measured a forward-only program at 2.3-3.4x its OWN full training step
(fwd 2628.6 vs step 1129.0 ms, same process), and the same step program
spread 595-1455 ms across processes (compile-draw + congestion).
--ab compiles every variant up front, alternates short/long chains
across them for --rounds rounds, and reports per-variant MINs — the only
comparison that survived sign-flips here. One-shot chains remain for
absolute single-variant floors on a believed-quiet tunnel.

    python benchmarks/probe_stress_nc.py --ab pairs,pairs_f32 --rounds 5
    python benchmarks/probe_stress_nc.py --only pairs   # one-shot floor
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
    ap.add_argument("--labeled", type=int, default=1_000)
    ap.add_argument("--classes", type=int, default=11)
    ap.add_argument("--bases", type=int, default=40)
    ap.add_argument("--hidden", type=int, default=10)
    ap.add_argument("--reciprocity", type=float, default=0.0,
                    help="fraction of reciprocal edge pairs in the "
                         "synthetic graph (AM is non-reciprocal-ish; "
                         "use to re-evaluate the composed pair "
                         "aggregation's locality argument)")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--only", default=None,
                    help="substring filter (each variant is a separate "
                         "multi-minute remote compile)")
    ap.add_argument("--parts", action="store_true",
                    help="also run the separate-jit component probes "
                         "(unreliable on the tunnel; see inline comment)")
    ap.add_argument("--ab", default=None,
                    help="comma list of variant names to A/B with "
                         "INTERLEAVED chains (the only trustworthy "
                         "cross-variant comparison at this scale)")
    ap.add_argument("--rounds", type=int, default=4,
                    help="interleaved A/B rounds")
    ap.add_argument("--draws", type=int, default=1,
                    help="compile draws per variant before interleaving "
                         "(draw-search; each is a multi-minute remote "
                         "compile at AM scale)")
    ap.add_argument("--agg-geom", default=None,
                    help="comma list of rb:ch aggregation-layout "
                         "geometries; adds xp_agg_rb{rb}ch{ch} (and "
                         "fwd_rb{rb}ch{ch}) variants riding an EdgeSet "
                         "whose dst layout uses that geometry")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--no-canary", action="store_true",
                    help="skip the tunnel-health canary bracketing "
                         "(rgcn_tpu/utils/canary.py) — every campaign is "
                         "bracketed by a pinned known-floor executable so "
                         "'believed-quiet tunnel' is a number, not a guess")
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

    import dataclasses

    import jax
    import jax.numpy as jnp
    import optax

    from rgcn_tpu.data.synthetic import synthetic_kg
    from rgcn_tpu.graph.structure import build_edge_set
    from rgcn_tpu.models import NodeClassifier
    from rgcn_tpu.train.optim import make_optimizer

    t0 = time.time()
    triples = synthetic_kg(args.nodes, args.rels, args.edges, seed=9,
                           reciprocity=args.reciprocity)
    from rgcn_tpu.graph.structure import auto_nc_row_block

    es_pairs = build_edge_set(
        triples, args.nodes, args.rels, tile_size=512,
        with_dst_layout=True, with_pair_index=True, with_pair_agg=True,
        layout_row_block=auto_nc_row_block(args.nodes),
    )
    es_plain = dataclasses.replace(es_pairs, pairs=None)
    # pair path WITHOUT the composed aggregation (explicit fan-out +
    # sorted-permutation aggregation — the pre-round-7 path)
    es_noagg = dataclasses.replace(
        es_pairs, pairs=dataclasses.replace(es_pairs.pairs, agg=None)
    )
    # pairs sorted by (src, rel): the wide basis-table gather reads
    # ascending rows (streaming) at the cost of fan-out locality on the
    # small computed table
    from rgcn_tpu.graph.structure import build_src_rel_pairs

    es_srcsort = dataclasses.replace(
        es_pairs, pairs=build_src_rel_pairs(es_pairs, order="src")
    )
    # Device-put EdgeSets ONCE, lazily per selected variant: jit
    # re-transfers numpy argument leaves on every call — on the tunneled
    # backend that is an RPC per step per used leaf (~80-100 MB/s), which
    # dominated and distorted every AM-scale number for rounds 6-8
    # (probe_amctx: the "slow in-program gathers" were the per-step
    # transfers of their own index/value arrays; isolated gathers were
    # always fast; first post-fix fwd: 83.4 vs 465-578 ms). Lazy + cached
    # because four resident device EdgeSets plus per-variant optimizer
    # states OOM the 16 GB chip in wide --ab campaigns.
    _dev_cache = {}

    def dev(es):
        key = id(es)
        if key not in _dev_cache:
            _dev_cache[key] = jax.device_put(es)
        return _dev_cache[key]
    print(
        f"probe_stress_nc: N={args.nodes} R={args.rels} "
        f"E={es_pairs.num_edges} pairs={es_pairs.pairs.num_pairs} "
        f"(x{es_pairs.num_edges / es_pairs.pairs.num_pairs:.2f} dedup) "
        f"prep={time.time() - t0:.1f}s",
        flush=True,
    )

    rng = np.random.default_rng(9)
    idx = jnp.asarray(rng.choice(args.nodes, args.labeled, replace=False))
    lbl = jnp.asarray(rng.integers(0, args.classes, args.labeled))

    model = NodeClassifier(
        num_nodes=args.nodes, num_relations=args.rels,
        num_classes=args.classes, hidden_size=args.hidden, num_layers=2,
        decomposition="basis", num_bases=args.bases,
    )
    tx = make_optimizer("adam", 0.01)

    def loss_fn(p, es, with_l2=True):
        logits = model.apply(p, es)
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits[idx], lbl
        ).mean()
        if with_l2:
            loss = loss + 5e-4 * model.layer1_l2(p)
        return loss

    def make_step(opt=tx, with_l2=True):
        @jax.jit
        def step(params, opt_state, es):
            loss, grads = jax.value_and_grad(
                lambda p: loss_fn(p, es, with_l2)
            )(params)
            upd, new_opt = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, upd), new_opt, loss

        return step

    def _perturb(params, loss):
        leaves, treedef = jax.tree.flatten(params)
        i = min(range(len(leaves)), key=lambda j: leaves[j].size)
        leaves[i] = leaves[i] + loss.astype(leaves[i].dtype) * 1e-12
        return jax.tree.unflatten(treedef, leaves)

    def make_fwd_step(with_l2=True):
        """Forward-only chained step: no grad, no optimizer. Data
        dependence rides the loss back into one param leaf (bounded, like
        bench.py::_make_step) so chained calls serialize honestly."""

        @jax.jit
        def step(params, opt_state, es):
            loss = loss_fn(params, es, with_l2)
            return _perturb(params, loss), opt_state, loss

        return step

    def make_expr_step(expr):
        """Chained step around an arbitrary scalar expression of
        (params, es) — forward-piece attribution with the same chained
        methodology as the step variants (separate-jit sync probes are
        NOT comparable on this tunnel)."""

        @jax.jit
        def step(params, opt_state, es):
            loss = expr(params, es)
            return _perturb(params, loss), opt_state, loss

        return step

    # --- forward-piece expressions (layer-1 featureless basis path) ---
    def _table(params):
        b = params["params"]["rgc1"]["bases"]
        return jax.lax.optimization_barrier(
            jnp.swapaxes(b, 0, 1).reshape(b.shape[1], -1)
        )

    def expr_l2pen(params, es):
        return model.layer1_l2(params)

    def expr_tbuild(params, es):
        return jnp.sum(_table(params))

    def expr_gather_contract(params, es):
        from rgcn_tpu.ops import spmm as _spmm

        t = _table(params)
        c = params["params"]["rgc1"]["comps"][:-1]
        m = _spmm._pair_contract(
            t, c, es.pairs, args.bases, args.hidden
        )
        return jnp.sum(m)

    def expr_l1full(params, es):
        from rgcn_tpu.nn.layers import RGCNConv as _Conv

        conv1 = _Conv(
            num_nodes=args.nodes, num_relations=2 * args.rels + 1,
            in_features=None, out_features=args.hidden,
            decomposition="basis", num_bases=args.bases,
        )
        return jnp.sum(
            conv1.apply({"params": params["params"]["rgc1"]}, es)
        )

    def expr_l1full_l2(params, es):
        return expr_l1full(params, es) + 5e-4 * model.layer1_l2(params)

    def expr_l2full(params, es):
        # layer 2 alone (featureful pairs path: H = X @ bases precompute,
        # wide (nb*dout2) pair gather, contract, fan-out + aggregation) on
        # a dummy barriered input of layer-1's output shape
        from rgcn_tpu.nn.layers import RGCNConv as _Conv

        conv2 = _Conv(
            num_nodes=args.nodes, num_relations=2 * args.rels + 1,
            in_features=args.hidden, out_features=args.classes,
            decomposition="basis", num_bases=args.bases,
        )
        vec = params["params"]["rgc2"]["bases"][0, :, 0]  # (din,) cheap
        x = jax.lax.optimization_barrier(
            jnp.broadcast_to(vec, (args.nodes, args.hidden))
        )
        return jnp.sum(
            conv2.apply({"params": params["params"]["rgc2"]}, es, x)
        )

    def _dummy_m(params, rows, width=None):
        vec = params["params"]["rgc1"]["bases"][:, 0, :].sum(axis=0)
        if width is not None and width != args.hidden:
            vec = jnp.tile(vec, -(-width // args.hidden))[:width]
        return jax.lax.optimization_barrier(
            jnp.broadcast_to(vec, (rows, width or args.hidden))
        )

    def expr_fan(params, es, width=None):
        # fan-out gather + val scale alone ((E,) rows from the (U, dout)
        # pair-message table; the read-back sum adds one (E, dout) pass).
        # `width` overrides the row width: the production dout=10 rows are
        # far below the 128-lane tile — measuring the same gather at 128
        # separates "per-row descriptor floor" from "sub-lane-tile slow
        # path" (ops/gather.py documents 3.5-6.2 ns/row at >= 128 cols).
        pi = es.pairs
        m = _dummy_m(params, pi.pair_src.shape[0], width)
        msgs = m[pi.edge_pair] * es.val[:, None]
        return jnp.sum(msgs)

    def expr_agg(params, es, width=None):
        # Pallas sorted aggregation alone on dummy (E, dout) messages
        from rgcn_tpu.ops.pallas_aggregate import aggregate_messages_ad

        msgs = _dummy_m(params, es.dst.shape[0], width)
        return jnp.sum(aggregate_messages_ad(msgs, es))

    def expr_aggk(params, es, width=None):
        # Pallas aggregation KERNEL alone: dummy PRESORTED (L, dout)
        # messages — no perm gather. xp_agg - xp_aggk = the perm gather's
        # cost; xp_aggk is the grid geometry's own cost.
        from rgcn_tpu.ops.pallas_aggregate import aggregate_presorted_pallas

        lay = es.layout
        msgs = _dummy_m(params, lay.perm.shape[0], width)
        out = aggregate_presorted_pallas(msgs, lay, es.num_nodes)
        return jnp.sum(out)

    def expr_fan_bar(params, es):
        # fan-out with a barrier between the gather and its consumers:
        # isolation (probe_gather6) measured this exact gather shape at
        # 6.2 ns/row (9.2 ms) vs xp_fan's 171 — if the barrier recovers
        # the isolated rate, XLA is fusing the gather into the consumer
        # as per-element loads (the xp_gcmat pathology).
        pi = es.pairs
        m = _dummy_m(params, pi.pair_src.shape[0])
        rows = jax.lax.optimization_barrier(m[pi.edge_pair])
        return jnp.sum(rows * es.val[:, None])

    def expr_fan_iso(params, es):
        # replicate probe_gather6's isolated program shape INSIDE this
        # program: cast producer (no broadcast, no barrier), gather, sum
        pi = es.pairs
        m = _dummy_m(params, pi.pair_src.shape[0])
        t = m * jnp.float32(1.0000001)
        return jnp.sum(t[pi.edge_pair])

    def expr_perm(params, es):
        # the layout permutation gather alone (barriered against consumer
        # fusion), no kernel
        lay = es.layout
        msgs = _dummy_m(params, es.dst.shape[0])
        msgs_z = jnp.concatenate(
            [msgs, jnp.zeros((1, msgs.shape[1]), msgs.dtype)], axis=0
        )
        return jnp.sum(jax.lax.optimization_barrier(msgs_z[lay.perm]))

    def expr_agg_bar(params, es):
        # perm gather BARRIERED, then the kernel: xp_agg minus consumer
        # fusion of the perm gather into the kernel feed
        from rgcn_tpu.ops.pallas_aggregate import aggregate_presorted_pallas

        lay = es.layout
        msgs = _dummy_m(params, es.dst.shape[0])
        msgs_z = jnp.concatenate(
            [msgs, jnp.zeros((1, msgs.shape[1]), msgs.dtype)], axis=0
        )
        srt = jax.lax.optimization_barrier(msgs_z[lay.perm])
        return jnp.sum(aggregate_presorted_pallas(srt, lay, es.num_nodes))

    def expr_fanagg(params, es):
        # The fan-out + aggregation piece alone: dummy pair messages (a
        # barriered broadcast — negligible to produce) fanned out through
        # the (E,)-row gather, val-scaled, and reduced by the production
        # Pallas sorted aggregation. Complements xp_gc: l1 ≈ tbuild + gc
        # + fanagg + self-loop dense term.
        from rgcn_tpu.ops.pallas_aggregate import aggregate_messages_ad
        from rgcn_tpu.ops.spmm import _pair_fan_aggregate

        pi = es.pairs
        u_pad = pi.pair_src.shape[0]
        vec = params["params"]["rgc1"]["bases"][:, 0, :].sum(axis=0)
        m = jax.lax.optimization_barrier(
            jnp.broadcast_to(vec, (u_pad, args.hidden))
        )
        out = _pair_fan_aggregate(
            m, es, lambda msgs, e: aggregate_messages_ad(msgs, e)
        )
        return jnp.sum(out)

    def expr_fused_wide(params, es, fusion=True, width=400):
        # THE decisive fused-gather test at AM scale: a `width`-wide
        # source-row gather feeding the Pallas aggregation directly, with
        # mosaic.allow_input_fusion on (the WN18 headline mechanism) vs
        # off (materialize (L, width) in HBM first). Models the traffic
        # of a contract-in-kernel basis layer (table = flat (N, nb·dout)).
        from rgcn_tpu.ops.pallas_aggregate import aggregate_presorted_pallas

        vec = params["params"]["rgc1"]["bases"][:, 0, :].sum(axis=0)
        vec = jnp.tile(vec, -(-width // args.hidden))[:width]
        table = jax.lax.optimization_barrier(
            jnp.broadcast_to(vec, (args.nodes, width))
        ).astype(jnp.bfloat16)
        lay = es.layout
        src_z = jnp.concatenate([es.src, jnp.zeros((1,), es.src.dtype)])
        src_sorted = src_z[lay.perm]  # int gather, cheap
        xg = table[jnp.clip(src_sorted, 0, args.nodes - 1)]
        if not fusion:
            xg = jax.lax.optimization_barrier(xg)
        out = aggregate_presorted_pallas(
            xg, lay, es.num_nodes, input_fusion=fusion
        )
        return jnp.sum(out)

    def expr_l1_aggfirst(params, es):
        # layer 1 via the WN18-class aggregation-first kernel
        # (rel_spmm_featureless_basis_ad): the wide (nb·dout) source-row
        # gather is INPUT-FUSED into the Pallas kernel's DMA pipeline —
        # the mechanism behind the headline op's 3.5 ns/row — at the cost
        # of nb=40 per-basis one-hot matmuls per chunk. Tests whether
        # fused gathers keep their rate at AM scale (the path is gated
        # num_bases <= 8 in production).
        from rgcn_tpu.ops.pallas_basis import rel_spmm_featureless_basis_ad

        b = params["params"]["rgc1"]["bases"]
        c = params["params"]["rgc1"]["comps"][:-1]
        out = rel_spmm_featureless_basis_ad(
            es, b, c, compute_dtype=jnp.bfloat16
        )
        return jnp.sum(out)

    def expr_gradagg(params, es):
        # the COMPOSED pair backward's d_m term alone: one presorted
        # aggregation over the slots-grouped-by-pair layout (dummy
        # cotangent rows; rides es_pairs — the production agg path)
        from rgcn_tpu.ops.pallas_aggregate import aggregate_presorted_pallas

        agg_l = es.pairs.agg
        u_pad = es.pairs.pair_src.shape[0]
        rows = _dummy_m(params, agg_l.grad_layout.perm.shape[0])
        out = aggregate_presorted_pallas(rows, agg_l.grad_layout, u_pad)
        return jnp.sum(out)

    def expr_aggfwd(params, es):
        # the composed forward aggregation alone: slot→pair gather +
        # Pallas kernel on dummy (U_pad, dout) pair messages (es_pairs)
        from rgcn_tpu.ops.pallas_aggregate import aggregate_pairs_ad

        pi = es.pairs
        m = _dummy_m(params, pi.pair_src.shape[0])
        out = aggregate_pairs_ad(
            m, es.val, pi.edge_pair, es.dst, pi.agg, es.layout,
            es.num_nodes,
        )
        return jnp.sum(out)

    def expr_dm_scatter(params, es):
        # the pair backward's d_m term: segment-sum of (E, dout) cotangent
        # rows into the (U+1, dout) pair table (XLA scatter-add)
        pi = es.pairs
        u_pad = pi.pair_src.shape[0]
        gm = _dummy_m(params, es.dst.shape[0])
        d_m = jax.ops.segment_sum(
            gm * es.val[:, None], pi.edge_pair, num_segments=u_pad + 1
        )
        return jnp.sum(d_m)

    def expr_dt_scatter(params, es):
        # the pair backward's dT term: scatter-add of (U, nb*dout) rows
        # into the (N, nb*dout) flat table (the AD of the wide gather)
        pi = es.pairs
        u_pad = pi.pair_src.shape[0]
        vec = params["params"]["rgc1"]["bases"][:, 0, :].sum(axis=0)
        vec = jnp.tile(vec, args.bases)
        rows = jax.lax.optimization_barrier(
            jnp.broadcast_to(vec, (u_pad, args.bases * args.hidden))
        )
        dt = jnp.zeros((args.nodes, args.bases * args.hidden),
                       jnp.float32).at[pi.pair_src].add(rows)
        return jnp.sum(dt)

    def expr_gc_gemm(params, es):
        # GEMM-form pair contraction: expand the per-pair weights to the
        # full nb·dout lanes (one-hot matmul), elementwise-scale the flat
        # gathered rows, and collapse with a static (nb·dout, dout)
        # selector — two full-width MXU GEMMs instead of U batched
        # (1, nb) @ (nb, dout) contractions. Isolation (probe_gather6)
        # says the gather is ~10 ms, so xp_gc's 81 ms is mostly the
        # batched einsum; this form re-expresses it MXU-natively.
        t = _table(params)
        c = params["params"]["rgc1"]["comps"][:-1]
        pi = es.pairs
        nb, dout = args.bases, args.hidden
        rows = jax.lax.optimization_barrier(t[pi.pair_src])  # (U, nb*dout)
        c_u = c[pi.pair_rel]  # (U, nb)
        expand = (
            jax.lax.broadcasted_iota(jnp.int32, (nb, nb * dout), 1) // dout
            == jax.lax.broadcasted_iota(jnp.int32, (nb, nb * dout), 0)
        ).astype(rows.dtype)
        collapse = (
            jax.lax.broadcasted_iota(jnp.int32, (nb * dout, dout), 0) % dout
            == jax.lax.broadcasted_iota(jnp.int32, (nb * dout, dout), 1)
        ).astype(jnp.float32)
        c_wide = jnp.dot(c_u.astype(rows.dtype), expand,
                         preferred_element_type=rows.dtype)  # (U, nb*dout)
        m = jnp.dot((rows * c_wide).astype(jnp.bfloat16), collapse.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)  # (U, dout)
        return jnp.sum(m)

    def expr_gc_mul(params, es):
        # explicit multiply+reduce instead of einsum: if XLA lowers the
        # contraction as U batched (1,nb)@(nb,dout) GEMMs it pads each to
        # MXU tiles; elementwise mul+sum cannot take that path
        t = _table(params)
        c = params["params"]["rgc1"]["comps"][:-1]
        pi = es.pairs
        rows = jax.lax.optimization_barrier(t[pi.pair_src]).reshape(
            -1, args.bases, args.hidden
        )
        c_u = c[pi.pair_rel]
        m = (rows * c_u[:, :, None].astype(rows.dtype)).sum(
            axis=1, dtype=jnp.float32
        )
        return jnp.sum(m)

    def expr_gc_mat(params, es):
        # like expr_gather_contract but with a barrier AFTER the gather:
        # forces one contiguous (U, nb*dout) gather pass instead of
        # letting XLA fuse the gather into the contraction (per-element
        # strided loads)
        t = _table(params)
        c = params["params"]["rgc1"]["comps"][:-1]
        pi = es.pairs
        rows = jax.lax.optimization_barrier(t[pi.pair_src])
        c_u = c[pi.pair_rel]
        m = jnp.einsum(
            "ubo,ub->uo",
            rows.reshape(-1, args.bases, args.hidden), c_u,
            preferred_element_type=jnp.float32,
        )
        return jnp.sum(m)

    import contextlib

    @contextlib.contextmanager
    def force_f32_pair_tables():
        """Override the TPU bf16 gather-table default (A/B knob)."""
        from rgcn_tpu.ops import spmm as _spmm

        orig_fl = _spmm.rel_spmm_featureless_basis
        orig_ff = _spmm.rel_spmm_basis_pairs
        _spmm.rel_spmm_featureless_basis = lambda *a, **k: orig_fl(
            *a, **{**k, "compute_dtype": None}
        )
        _spmm.rel_spmm_basis_pairs = lambda *a, **k: orig_ff(
            *a, **{**k, "compute_dtype": None}
        )
        try:
            yield
        finally:
            _spmm.rel_spmm_featureless_basis = orig_fl
            _spmm.rel_spmm_basis_pairs = orig_ff

    def chain(step, es, iters, opt=tx):
        params = model.init(jax.random.key(0), es)
        opt_state = opt.init(params)
        t0 = time.time()
        params, opt_state, loss = step(params, opt_state, es)
        print(f"  compile+first: {time.time() - t0:.1f}s "
              f"(loss {float(loss):.3f})", flush=True)

        def run(k):
            nonlocal params, opt_state
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(k):
                    params, opt_state, loss = step(params, opt_state, es)
                float(loss)
                ts.append(time.perf_counter() - t0)
            return min(ts)

        return (run(1 + iters) - run(1)) / iters

    sgd = make_optimizer("sgd", 0.01)

    @contextlib.contextmanager
    def variant_flags(name):
        """Trace-time flag flips encoded in variant names — ONE place,
        used by BOTH the interleaved and sequential paths, so a
        variant's label always matches the program it measured.
        Suffixes flip defaults OFF (the bare variant is production):
        _nofuse (pairs input fusion), _nopad (lane padding), _nogemm
        (GEMM pair contraction), _dtscat (scatter-free dT backward),
        _valjit (host-composed static slot values), _grp256 (restore
        the pre-round-10 256M pair element budget — AM layer 2 back to
        the serialized checkpoint groups)."""
        import rgcn_tpu.ops.pallas_aggregate as _pa

        from rgcn_tpu.ops import spmm as _spmm_mod

        old = (
            _pa._PAIRS_INPUT_FUSION, _spmm_mod._FAN_AGG_PAD,
            _spmm_mod._PAIR_CONTRACT_GEMM, _spmm_mod._PAIR_DT_LAYOUT,
            _pa._PAIR_STATIC_VAL, _spmm_mod._PAIR_ELEM_BUDGET,
        )
        if "nofuse" in name:
            _pa._PAIRS_INPUT_FUSION = False
        if "nopad" in name:
            _spmm_mod._FAN_AGG_PAD = False
        if "nogemm" in name:
            _spmm_mod._PAIR_CONTRACT_GEMM = False
        if "dtscat" in name:
            _spmm_mod._PAIR_DT_LAYOUT = False
        if "valjit" in name:
            _pa._PAIR_STATIC_VAL = False
        if "grp256" in name:
            _spmm_mod._PAIR_ELEM_BUDGET = 256_000_000
        try:
            yield
        finally:
            (
                _pa._PAIRS_INPUT_FUSION, _spmm_mod._FAN_AGG_PAD,
                _spmm_mod._PAIR_CONTRACT_GEMM,
                _spmm_mod._PAIR_DT_LAYOUT, _pa._PAIR_STATIC_VAL,
                _spmm_mod._PAIR_ELEM_BUDGET,
            ) = old

    # (builder, EdgeSet, optimizer, force-f32-tables?) per variant:
    # *_f32 = the pre-bf16 baseline; fwd* = forward-only (splits fwd vs
    # bwd+adam); sgd = optimizer ablation (Adam cost on 120M params);
    # nol2 = layer-1 L2 penalty ablation.
    # NOTE: since round 10 the PRODUCTION path is "agg" — es_pairs with
    # the composed pair aggregation, GEMM contraction, static slot
    # values, dt-layout backward and the 512M budget all default-ON
    # (the round-7 "2.3x slower" verdict on the composed path was
    # transfer contamination). "pairs"/"fwd" ride es_noagg — the
    # EXPLICIT fan-out baseline the round-10 default replaced; xp_*
    # pieces attribute that explicit path unless suffixed otherwise.
    variants = {
        "plain": (lambda: make_step(), es_plain, tx, False),
        "pairs": (lambda: make_step(), es_noagg, tx, False),
        "pairs_f32": (lambda: make_step(), es_noagg, tx, True),
        "fwd": (make_fwd_step, es_noagg, tx, False),
        # "_nopad" variants disable the lane-padded fan+agg pipeline
        # (spmm._FAN_AGG_PAD; trace-time flip like "_nofuse")
        "fwd_nopad": (make_fwd_step, es_noagg, tx, False),
        "pairs_nopad": (lambda: make_step(), es_noagg, tx, False),
        # "_nogemm" disables the (default-ON since round 10) GEMM-form
        # pair contraction — the batched-einsum baseline
        "fwd_nogemm": (make_fwd_step, es_noagg, tx, False),
        "pairs_nogemm": (lambda: make_step(), es_noagg, tx, False),
        "fwd_f32": (make_fwd_step, es_noagg, tx, True),
        "fwd_nol2": (lambda: make_fwd_step(with_l2=False), es_noagg, tx,
                     False),
        "sgd": (lambda: make_step(opt=sgd), es_noagg, sgd, False),
        "nol2": (lambda: make_step(with_l2=False), es_noagg, tx, False),
        "noagg": (lambda: make_step(), es_noagg, tx, False),
        "fwd_noagg": (make_fwd_step, es_noagg, tx, False),
        "agg": (lambda: make_step(), es_pairs, tx, False),
        "agg_nogemm": (lambda: make_step(), es_pairs, tx, False),
        # "_dtscat": dT term as the XLA scatter-add baseline
        "agg_dtscat": (lambda: make_step(), es_pairs, tx, False),
        # "_valjit": per-step in-jit val gathers (pre-round-10 baseline)
        "agg_valjit": (lambda: make_step(), es_pairs, tx, False),
        "fwd_agg_valjit": (make_fwd_step, es_pairs, tx, False),
        # "_grp256": pre-round-10 256M pair budget — AM layer 2 (~260M
        # elements) back on the serialized lax.map checkpoint groups
        # (the round-10 512M default measured 164.7 vs 186.0 ms)
        "agg_grp256": (lambda: make_step(), es_pairs, tx, False),
        "fwd_agg_grp256": (make_fwd_step, es_pairs, tx, False),
        "fwd_agg": (make_fwd_step, es_pairs, tx, False),
        "agg_nofuse": (lambda: make_step(), es_pairs, tx, False),
        "fwd_agg_nofuse": (make_fwd_step, es_pairs, tx, False),
        "srcsort": (lambda: make_step(), es_srcsort, tx, False),
        "fwd_srcsort": (make_fwd_step, es_srcsort, tx, False),
        # forward pieces (chained; compose to fwd_nol2 + l2pen ≈ fwd).
        # ALL pieces ride es_noagg — the PRODUCTION EdgeSet. Round 8's
        # "physically impossible" xp_l1 (a piece interleaving ABOVE its
        # own full forward) was exactly this mismatch: the xp_* variants
        # rode es_pairs, whose pairs.agg routes the layer through the
        # COMPOSED pair aggregation (measured 2.3x slower forward, round
        # 7) while fwd rode es_noagg. A piece probe must run the same
        # code path as the step it attributes.
        "xp_l2pen": (lambda: make_expr_step(expr_l2pen), es_noagg, tx,
                     False),
        "xp_tbuild": (lambda: make_expr_step(expr_tbuild), es_noagg, tx,
                      False),
        "xp_gc": (lambda: make_expr_step(expr_gather_contract), es_noagg,
                  tx, False),
        "xp_fanagg": (lambda: make_expr_step(expr_fanagg), es_noagg, tx,
                      False),
        "xp_fan": (lambda: make_expr_step(expr_fan), es_noagg, tx, False),
        "xp_agg": (lambda: make_expr_step(expr_agg), es_noagg, tx, False),
        "xp_aggk": (lambda: make_expr_step(expr_aggk), es_noagg, tx,
                    False),
        "xp_fan_bar": (lambda: make_expr_step(expr_fan_bar), es_noagg, tx,
                       False),
        "xp_fan_iso": (lambda: make_expr_step(expr_fan_iso), es_noagg, tx,
                       False),
        "xp_perm": (lambda: make_expr_step(expr_perm), es_noagg, tx,
                    False),
        "xp_agg_bar": (lambda: make_expr_step(expr_agg_bar), es_noagg, tx,
                       False),
        # width variants: same pieces with 128-lane rows (see expr_fan)
        "xp_fan128": (lambda: make_expr_step(
            lambda p, e: expr_fan(p, e, width=128)), es_noagg, tx, False),
        "xp_agg128": (lambda: make_expr_step(
            lambda p, e: expr_agg(p, e, width=128)), es_noagg, tx, False),
        "xp_aggk128": (lambda: make_expr_step(
            lambda p, e: expr_aggk(p, e, width=128)), es_noagg, tx,
            False),
        "xp_l1af": (lambda: make_expr_step(expr_l1_aggfirst), es_noagg,
                    tx, False),
        "xp_fusedw": (lambda: make_expr_step(
            lambda p, e: expr_fused_wide(p, e, fusion=True)), es_noagg,
            tx, False),
        "xp_unfusedw": (lambda: make_expr_step(
            lambda p, e: expr_fused_wide(p, e, fusion=False)), es_noagg,
            tx, False),
        "xp_gcgemm": (lambda: make_expr_step(expr_gc_gemm), es_noagg, tx,
                      False),
        "xp_dm": (lambda: make_expr_step(expr_dm_scatter), es_noagg, tx,
                  False),
        # agg-path pieces (ride es_pairs — the production composed path)
        "xp_gradagg": (lambda: make_expr_step(expr_gradagg), es_pairs, tx,
                       False),
        "xp_aggfwd": (lambda: make_expr_step(expr_aggfwd), es_pairs, tx,
                      False),
        "xp_dt": (lambda: make_expr_step(expr_dt_scatter), es_noagg, tx,
                  False),
        "xp_gcmat": (lambda: make_expr_step(expr_gc_mat), es_noagg, tx,
                     False),
        "xp_gcmul": (lambda: make_expr_step(expr_gc_mul), es_noagg, tx,
                     False),
        "xp_l1": (lambda: make_expr_step(expr_l1full), es_noagg, tx,
                  False),
        "xp_l1l2": (lambda: make_expr_step(expr_l1full_l2), es_noagg, tx,
                    False),
        "xp_l2": (lambda: make_expr_step(expr_l2full), es_noagg, tx,
                  False),
    }
    if args.agg_geom:
        # Alternate aggregation-layout geometries on the production
        # EdgeSet: per-chunk grid overhead scales with the chunk count
        # (n_chunks = L / ch), so sweeping ch (and rb) separates "the
        # aggregation math costs this" from "the grid geometry costs
        # this". Each geometry gets the full-forward variant too, so a
        # winning geometry is immediately validated end-to-end.
        from rgcn_tpu.ops.pallas_aggregate import build_dst_layout

        for spec in args.agg_geom.split(","):
            rb_s, ch_s = spec.split(":")
            rb_g, ch_g = int(rb_s), int(ch_s)
            lay = build_dst_layout(
                np.asarray(es_noagg.dst), args.nodes,
                row_block=rb_g, chunk=ch_g,
            )
            es_g = dataclasses.replace(es_noagg, layout=lay)
            tag = f"rb{rb_g}ch{ch_g}"
            print(
                f"  [geom {tag}] slots={lay.perm.shape[0]} "
                f"chunks={lay.num_chunks} row_blocks={lay.num_row_blocks}",
                flush=True,
            )
            variants[f"xp_agg_{tag}"] = (
                lambda: make_expr_step(expr_agg), es_g, tx, False)
            variants[f"xp_aggk_{tag}"] = (
                lambda: make_expr_step(expr_aggk), es_g, tx, False)
            variants[f"xp_fanagg_{tag}"] = (
                lambda: make_expr_step(expr_fanagg), es_g, tx, False)
            variants[f"xp_fusedw_{tag}"] = (
                lambda: make_expr_step(
                    lambda p, e: expr_fused_wide(p, e, fusion=True)),
                es_g, tx, False)
            variants[f"fwd_{tag}"] = (make_fwd_step, es_g, tx, False)

    # forward-only / expression pieces never touch the optimizer state —
    # register them with sgd (EmptyState) so a wide --ab campaign does
    # not hold one 1-GB adam state PER VARIANT on the 16 GB chip
    variants = {
        name: (b, es, (sgd if name.startswith(("fwd", "xp_")) else opt),
               f32)
        for name, (b, es, opt, f32) in variants.items()
    }

    def chain_interleaved(named_steps, iters, rounds=4, draws=1):
        """Interleaved A/B: compile every variant, then alternate
        short/long chain measurements across variants for several rounds
        and take the per-variant min difference. At AM scale a single
        chain spans tens of seconds — long enough to absorb cross-tenant
        congestion bursts on the tunneled chip (observed: a forward-only
        program 'measuring' 2.3x its own full training step in one-shot
        chains). Interleaving exposes every variant to the same bursts;
        min-over-rounds recovers each variant's floor.

        ``draws > 1`` additionally DRAW-SEARCHES each variant before
        interleaving: the compile-draw lottery hits small piece programs
        as hard as full steps (round 7: a conv1-only program drew
        1.5-3.1 s against a 725 ms full step, which blocked per-piece
        attribution) — compiling N fresh draws per variant and keeping
        the fastest by a short chained estimate gives every variant its
        good draw before the honest interleaved comparison starts, the
        same remedy the trainers use (exe_search)."""
        states = {}
        for name, (step, es, opt) in named_steps.items():
            es = dev(es)
            params = model.init(jax.random.key(0), es)
            opt_state = opt.init(params)
            t0 = time.time()
            # suffix variants flip TRACE-time choices — they must wrap
            # the FIRST call / lowering (where jit traces), not the
            # builder (variant_flags: the single source of suffix truth)
            ctx = (
                force_f32_pair_tables()
                if name.endswith("_f32")
                else contextlib.nullcontext()
            )
            with variant_flags(name), ctx:
                if draws > 1:
                    best_c = best_ms = None
                    for i in range(draws):
                        # a fresh lowering per attempt — reusing one
                        # Lowered can hand back a cached executable
                        # instead of a fresh draw
                        td = time.time()
                        cand = step.lower(
                            params, opt_state, es
                        ).compile()
                        p, o, loss = cand(params, opt_state, es)
                        float(loss)
                        t_s = time.perf_counter()
                        p, o, loss = cand(p, o, es)
                        float(loss)
                        t_s = time.perf_counter() - t_s
                        t_l = time.perf_counter()
                        for _ in range(4):
                            p, o, loss = cand(p, o, es)
                        float(loss)
                        t_l = time.perf_counter() - t_l
                        ms = (t_l - t_s) / 3 * 1e3
                        print(
                            f"  [{name}] draw {i}: {ms:.1f} ms "
                            f"(compile+est {time.time() - td:.1f}s)",
                            flush=True,
                        )
                        if best_ms is None or ms < best_ms:
                            best_c, best_ms = cand, ms
                    step = best_c
                params, opt_state, loss = step(params, opt_state, es)
            print(f"  [{name}] compile+first: {time.time() - t0:.1f}s "
                  f"(loss {float(loss):.3f})", flush=True)
            states[name] = [step, es, params, opt_state]

        def run(name, k):
            step, es, params, opt_state = states[name]
            t0 = time.perf_counter()
            for _ in range(k):
                params, opt_state, loss = step(params, opt_state, es)
            float(loss)
            states[name][2:] = [params, opt_state]
            return time.perf_counter() - t0

        best = {name: float("inf") for name in named_steps}
        for rnd in range(rounds):
            for name in named_steps:
                t_short = run(name, 1)
                t_long = run(name, 1 + iters)
                dt = (t_long - t_short) / iters
                best[name] = min(best[name], dt)
                print(f"  [round {rnd}] {name}: {dt * 1e3:.1f} ms/step "
                      f"(best {best[name] * 1e3:.1f})", flush=True)
        return {k: round(v * 1e3, 1) for k, v in best.items()}

    only = args.only.split(",") if args.only else None

    def selected(name):
        if only is None:
            return True
        # a token naming a variant exactly selects only that variant;
        # other tokens are substrings
        return name in only or any(
            o in name for o in only if o not in variants
        )

    if only is None and not args.ab:
        # a bare invocation must not compile ~20 variants (each is a
        # multi-minute remote compile); default to the production step
        only = ["pairs"]

    results = {}
    if args.ab:
        named = {}
        for name in args.ab.split(","):
            builder, es, opt, f32 = variants[name]
            if f32:
                with force_f32_pair_tables():
                    named[name] = (builder(), es, opt)
            else:
                named[name] = (builder(), es, opt)
        results = chain_interleaved(named, args.iters, rounds=args.rounds,
                                    draws=args.draws)
        for name, ms in results.items():
            print(f"  {name}: {ms} ms/step (interleaved min)", flush=True)
    for name, (builder, es, opt, f32) in variants.items():
        if args.ab or not selected(name):
            continue
        ctx = force_f32_pair_tables() if f32 else contextlib.nullcontext()
        with variant_flags(name), ctx:
            dt = chain(builder(), dev(es), args.iters, opt=opt)
        results[name] = round(dt * 1e3, 1)
        print(f"  {name}: {dt * 1e3:.1f} ms/step", flush=True)

    # ------------------------------------------------------------------
    # Component attribution via separate jits (opt-in: separate-program
    # compile draws measured internally inconsistent with the step on the
    # tunnel — l1_fwd alone once measured 694 ms against a 595 ms full
    # step; prefer the in-step ablation variants above).
    # ------------------------------------------------------------------
    def _finish():
        if canary:
            from rgcn_tpu.utils.canary import measure_canary

            canary["after"] = measure_canary(tag="after")
            if not (canary["before"].get("healthy")
                    and canary["after"].get("healthy")):
                print(
                    "probe_stress_nc: WARNING — canary above its floor "
                    "gate on at least one side of the campaign; treat "
                    "these numbers as congestion-suspect (re-run on a "
                    "quiet tunnel before recording them)",
                    file=sys.stderr, flush=True,
                )
        return {"canary": canary} if canary else {}

    if not args.parts:
        print(json.dumps({
            "what": "probe_stress_nc", "nodes": args.nodes,
            "rels": args.rels, "edges": int(es_pairs.num_edges),
            "pairs": int(es_pairs.pairs.num_pairs),
            "bases": args.bases, "hidden": args.hidden,
            "ms_per_step": results, **_finish(),
        }), flush=True)
        return
    from rgcn_tpu.nn.layers import RGCNConv

    r_aug = 2 * args.rels + 1

    def timed(tag, fn, *fargs, reps=3):
        if args.only and args.only not in tag:
            return
        t0 = time.time()
        float(jnp.sum(fn(*fargs)))
        print(f"  {tag}: compile+first {time.time() - t0:.1f}s", flush=True)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(jnp.sum(fn(*fargs)))
            ts.append(time.perf_counter() - t0)
        results[tag] = round(min(ts) * 1e3, 1)
        print(f"  {tag}: {min(ts) * 1e3:.1f} ms", flush=True)

    conv1 = RGCNConv(
        num_nodes=args.nodes, num_relations=r_aug, in_features=None,
        out_features=args.hidden, decomposition="basis",
        num_bases=args.bases,
    )
    p1 = conv1.init(jax.random.key(1), es_plain)

    @jax.jit
    def l1_fwd(p, es):
        return jnp.sum(conv1.apply(p, es) ** 2)

    @jax.jit
    def l1_grad(p, es):
        g = jax.grad(lambda q: jnp.sum(conv1.apply(q, es) ** 2))(p)
        return sum(jnp.sum(x) for x in jax.tree.leaves(g))

    conv2 = RGCNConv(
        num_nodes=args.nodes, num_relations=r_aug,
        in_features=args.hidden, out_features=args.classes,
        decomposition="basis", num_bases=args.bases,
    )
    x2 = jnp.asarray(
        np.random.default_rng(2).normal(
            size=(args.nodes, args.hidden)
        ).astype(np.float32)
    )
    p2 = conv2.init(jax.random.key(2), es_plain, x2)

    @jax.jit
    def l2_grad(p, es, x):
        g = jax.grad(
            lambda q: jnp.sum(conv2.apply(q, es, x) ** 2)
        )(p)
        return sum(jnp.sum(v) for v in jax.tree.leaves(g))

    timed("l1_fwd_plain", l1_fwd, p1, es_plain)
    timed("l1_fwd_pairs", l1_fwd, p1, es_pairs)
    timed("l1_grad_plain", l1_grad, p1, es_plain)
    timed("l1_grad_pairs", l1_grad, p1, es_pairs)
    timed("l2_grad", l2_grad, p2, es_plain, x2)

    print(json.dumps({
        "what": "probe_stress_nc", "nodes": args.nodes, "rels": args.rels,
        "edges": int(es_pairs.num_edges),
        "pairs": int(es_pairs.pairs.num_pairs),
        "bases": args.bases, "hidden": args.hidden,
        "ms_per_step": results, **_finish(),
    }), flush=True)


if __name__ == "__main__":
    main()
