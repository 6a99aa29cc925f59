#!/usr/bin/env python
"""Attribute the WN18-scale LP production step's time to components.

Same-process chained timings (>= 60 iters) of: the full hosted step, the
encoder-only step, the decoder-only step (frozen z as input), and the
decoder forward alone — to pin where the remaining milliseconds live
before optimizing (VERDICT r2 item 2).

    python benchmarks/probe_lp_step.py [--iters 60]
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
    ap.add_argument("--iters", type=int, default=60)
    ap.add_argument(
        "--only", default=None,
        help="substring filter on result keys (skip other variants — each "
             "variant is a separate multi-minute remote compile here)",
    )
    args = ap.parse_args()

    def want(name: str) -> bool:
        return args.only is None or args.only in name

    from rgcn_tpu.utils.compile_cache import enable

    enable()

    import jax
    import jax.numpy as jnp
    import optax

    from rgcn_tpu.graph.dynamic import build_edge_set_dynamic_host
    from rgcn_tpu.models import LinkPredictor
    from rgcn_tpu.ops.pallas_distmult import (
        build_structured_layouts,
        distmult_structured_agg_ad,
    )
    from rgcn_tpu.train.negative import corrupt_batch_host
    from rgcn_tpu.train.optim import make_optimizer

    lp_n, lp_r, lp_b, dim, ns = 40943, 18, 30000, 200, 10
    rng = np.random.default_rng(0)
    from rgcn_tpu.data.synthetic import synthetic_kg

    lp_triples = synthetic_kg(lp_n, lp_r, 5 * lp_b, seed=1)[: 2 * lp_b]
    pos_np = np.asarray(lp_triples[:lp_b])
    pos0 = jnp.asarray(pos_np)

    model = LinkPredictor(
        num_nodes=lp_n, num_relations=lp_r, emb_dim=dim, hidden1_size=dim,
        num_layers=1, decomposition="basis", num_bases=2,
        weight_init="schlichtkrull-normal", bias_init="zeros",
        decoder_l2_type="schlichtkrull-l2", decoder_l2=0.01,
    )
    es_host = build_edge_set_dynamic_host(
        pos_np, lp_n, lp_r, tile_size=128, dropout_rate=0.5,
        dropout_rng=np.random.default_rng(3), with_dst_layout=True,
        row_block=128, layout_chunk=256,
    )
    batch_h, labels_h, ch_h, ce_h = corrupt_batch_host(
        np.random.default_rng(4), pos_np, lp_n, ns, 0.5,
        return_structure=True,
    )
    st_lays = build_structured_layouts(pos_np, ce_h, lp_n)
    st_lays_sorted = build_structured_layouts(
        pos_np, ce_h, lp_n, sorted_corrupt=True, corrupt_head=ch_h
    )
    labels = jnp.asarray(labels_h)
    ch_ = jnp.asarray(ch_h)
    ce_ = jnp.asarray(ce_h)
    pw = jnp.full((labels.shape[0],), 1.0 / labels.shape[0], jnp.float32)

    params = model.init(
        {"params": jax.random.key(1)},
        es_host, pos0,
    )
    tx = make_optimizer("adam", 0.01)
    opt_state = tx.init(params)

    def chain(step_fn, fetch, *state, iters=args.iters):
        def run(k):
            s = step_fn(*state)
            fetch(s)
            ts = []
            for _ in range(3):
                s = state
                t0 = time.perf_counter()
                for _ in range(k):
                    s = step_fn(*s)
                fetch(s)
                ts.append(time.perf_counter() - t0)
            return min(ts)

        return (run(2 + iters) - run(2)) / iters

    results = {}

    # geometry variants for the sorted layouts (probe_lp_bwd measured the
    # VJP-level effect; this measures the full step)
    st_lays_g1 = build_structured_layouts(
        pos_np, ce_h, lp_n, sorted_corrupt=True, corrupt_head=ch_h,
        p_row_block=512,
    )
    st_lays_g2 = build_structured_layouts(
        pos_np, ce_h, lp_n, row_block=512, chunk=256,
        sorted_corrupt=True, corrupt_head=ch_h,
    )

    es_host_enc512 = build_edge_set_dynamic_host(
        pos_np, lp_n, lp_r, tile_size=128, dropout_rate=0.5,
        dropout_rng=np.random.default_rng(3), with_dst_layout=True,
        row_block=512, layout_chunk=256,
    )

    # bwd_dtype variant: same params tree, narrow decoder backward
    model_bf16 = model.clone(decoder_bwd_dtype="bfloat16")

    # --- 1) full production step (plain vs sorted corrupted-side bwd;
    # "_production" = what the trainer now builds: rb512 encoder layouts
    # + all-512 structured layouts; "_production_bf16bwd" additionally
    # narrows the decoder backward — config decoder.bwd_dtype) ---
    for tag, es_v, lays, mdl in (
        ("", es_host, st_lays, model),
        ("_sorted", es_host, st_lays_sorted, model),
        ("_sorted_p512", es_host, st_lays_g1, model),
        ("_sorted_all512", es_host, st_lays_g2, model),
        ("_production", es_host_enc512, st_lays_g2, model),
        ("_production_bf16bwd", es_host_enc512, st_lays_g2, model_bf16),
    ):
        if not want(f"full_step{tag}_ms"):
            continue

        @jax.jit
        def full_step(params, opt_state, _es=es_v, _lays=lays, _m=mdl):
            def loss_fn(p):
                scores, pen = _m.apply(
                    p, _es, pos0, ch_, ce_, pw, _lays,
                    method=_m.structured_scores,
                )
                return (
                    optax.sigmoid_binary_cross_entropy(scores, labels).mean()
                    + 0.01 * pen
                )

            loss, grads = jax.value_and_grad(loss_fn)(params)
            upd, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, upd), opt_state

        results[f"full_step{tag}_ms"] = chain(
            full_step,
            lambda s: float(jax.tree.leaves(s[0])[0].reshape(-1)[0]),
            params, opt_state,
        ) * 1e3

    # --- 2) encoder-only step (same graph, loss = sum encode), with an
    # encoder-layout geometry variant: the per-epoch static slot bound at
    # rb=128/ch=256 is ~142k slots for a 60k-edge subgraph (57% padding);
    # rb=512 cuts the bound to ~81k ---
    es_host_512 = build_edge_set_dynamic_host(
        pos_np, lp_n, lp_r, tile_size=128, dropout_rate=0.5,
        dropout_rng=np.random.default_rng(3), with_dst_layout=True,
        row_block=512, layout_chunk=256,
    )
    for tag, es_v in (("", es_host), ("_rb512", es_host_512)):
        if not want(f"encoder_step{tag}_ms"):
            continue

        @jax.jit
        def enc_step(params, opt_state, _es=es_v):
            def loss_fn(p):
                z = model.apply(p, _es, method=model.encode)
                return jnp.sum(jnp.sin(z))

            loss, grads = jax.value_and_grad(loss_fn)(params)
            upd, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, upd), opt_state

        results[f"encoder_step{tag}_ms"] = chain(
            enc_step,
            lambda s: float(jax.tree.leaves(s[0])[0].reshape(-1)[0]),
            params, opt_state,
        ) * 1e3

    # --- 3) decoder-only (frozen z input; nodes/relations as params) ---
    z0 = jax.jit(lambda p: model.apply(p, es_host, method=model.encode))(
        params
    )
    z0 = jax.block_until_ready(z0)
    rel0 = jnp.asarray(rng.normal(size=(lp_r, dim)).astype(np.float32))
    dec_opt = optax.adam(0.01)
    dec_state = dec_opt.init((z0, rel0))

    for tag, lays, bdt in (
        ("", st_lays, None),
        ("_sorted", st_lays_sorted, None),
        ("_sorted512_bf16", st_lays_g2, jnp.bfloat16),
        ("_sorted512", st_lays_g2, None),
    ):
        if not want(f"decoder_step{tag}_ms"):
            continue

        @jax.jit
        def dec_step(zr, opt_state, z_in, _lays=lays, _bdt=bdt):
            z, rel = zr

            def loss_fn(zr):
                z_, rel_ = zr
                scores, pen = distmult_structured_agg_ad(
                    pos0, ch_, ce_, z_ + z_in * 1e-9, rel_, pw, _lays,
                    bwd_dtype=_bdt,
                )
                return (
                    optax.sigmoid_binary_cross_entropy(scores, labels).mean()
                    + 0.01 * pen
                )

            loss, grads = jax.value_and_grad(loss_fn)((z, rel))
            upd, opt_state = dec_opt.update(grads, opt_state, (z, rel))
            return optax.apply_updates((z, rel), upd), opt_state, z_in

        results[f"decoder_step{tag}_ms"] = chain(
            dec_step,
            lambda s: float(s[0][0].reshape(-1)[0]),
            (z0, rel0), dec_state, z0,
        ) * 1e3

    # --- 4) decoder forward only ---
    @jax.jit
    def dec_fwd(z_in, rel):
        scores, pen = distmult_structured_agg_ad(
            pos0, ch_, ce_, z_in, rel, pw, st_lays
        )
        return z_in + (jnp.sum(scores) + pen) * 1e-12

    def fwd_step(z_in, rel):
        return dec_fwd(z_in, rel), rel

    if not want("decoder_fwd_ms"):
        results["decoder_fwd_ms"] = None
    else:
        results["decoder_fwd_ms"] = chain(
            fwd_step,
            lambda s: float(s[0].reshape(-1)[0]),
            z0, rel0,
        ) * 1e3

    import json

    for k_, v in results.items():
        results[k_] = round(v, 3) if v is not None else None
    print(json.dumps(results))


if __name__ == "__main__":
    main()
