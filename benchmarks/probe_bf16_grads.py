#!/usr/bin/env python
"""Gradient error of the opt-in bf16 decoder backward (decoder.bwd_dtype).

The bf16 backward halves the structured scorer's gather-table and residual
bytes; forward scores are bit-identical, but `d nodes` / `d relations`
lose mantissa. The only prior evidence for metric neutrality was one
fabricated-data MRR point (tests/test_parity_harness.py). This probe
quantifies the gradient error directly: at several points along an f32
training trajectory it computes the FULL production-step gradient twice on
identical state — f32 backward vs bf16 backward — and reports per-leaf
cosine similarity and relative L2 error. That gives a user the quantitative
basis to decide bwd_dtype without real-dataset access.

    python benchmarks/probe_bf16_grads.py [--steps 30] [--d 64]

Runs on CPU by default (the structured path's backward math is identical;
interpret-mode kernels) — pass --tpu to run on the chip.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=3000)
    ap.add_argument("--rels", type=int, default=12)
    ap.add_argument("--edges", type=int, default=15000)
    ap.add_argument("--batch", type=int, default=1500)
    ap.add_argument("--ns", type=int, default=10)
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--measure-every", type=int, default=5)
    ap.add_argument("--tpu", action="store_true")
    args = ap.parse_args()

    if not args.tpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import dataclasses

    import jax
    import jax.numpy as jnp
    import optax

    from rgcn_tpu.config import load_experiment
    from rgcn_tpu.data.synthetic import synthetic_link_prediction
    from rgcn_tpu.graph.dynamic import (
        auto_layout_row_block,
        build_edge_set_dynamic_host,
    )
    from rgcn_tpu.ops.pallas_distmult import build_structured_layouts
    from rgcn_tpu.train.link_prediction import build_lp_model
    from rgcn_tpu.train.negative import corrupt_batch_host
    from rgcn_tpu.train.optim import make_optimizer

    data = synthetic_link_prediction(
        num_nodes=args.nodes, num_rels=args.rels, num_edges=args.edges,
        seed=3, reciprocity=0.5,
    )
    cfg = load_experiment(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs", "rgcn", "lp-WN18.yaml",
    ))
    cfg = dataclasses.replace(
        cfg,
        encoder=dataclasses.replace(
            cfg.encoder, node_embedding=args.d, hidden1_size=args.d,
        ),
    )
    n, r = args.nodes, args.rels
    model_f32 = build_lp_model(cfg, n, r)
    cfg_bf16 = dataclasses.replace(
        cfg, decoder=dataclasses.replace(cfg.decoder, bwd_dtype="bfloat16")
    )
    model_bf16 = build_lp_model(cfg_bf16, n, r)

    train = np.asarray(data.train, dtype=np.int64)
    rng = np.random.default_rng(17)

    def epoch_inputs(epoch):
        idx = rng.choice(len(train), size=min(args.batch, len(train)),
                         replace=False)
        positives = train[idx]
        enc_rb = auto_layout_row_block(n, 2 * len(positives))
        edges = build_edge_set_dynamic_host(
            positives, n, r, tile_size=128,
            dropout_rate=cfg.encoder.edge_dropout.general,
            dropout_rng=np.random.default_rng((3, epoch)),
            with_dst_layout=True, row_block=enc_rb, layout_chunk=256,
        )
        batch, labels, ch_, ce_ = corrupt_batch_host(
            np.random.default_rng((5, epoch)), positives, n, args.ns, 0.5,
            return_structure=True,
        )
        st_lays = build_structured_layouts(
            positives, ce_, n, row_block=512, chunk=256,
            sorted_corrupt=True, corrupt_head=ch_,
        )
        return jax.device_put(
            (jnp.asarray(positives), edges, jnp.asarray(labels),
             jnp.asarray(ch_), jnp.asarray(ce_),
             jax.tree.map(jnp.asarray, st_lays))
        )

    def make_loss(model):
        def loss_fn(p, positives, edges, labels, ch_, ce_, st_lays):
            total = labels.shape[0]
            pw = jnp.full((total,), 1.0 / total, jnp.float32)
            scores, penalty = model.apply(
                p, edges, positives, ch_, ce_, pw, st_lays,
                method=model.structured_scores,
            )
            loss = optax.sigmoid_binary_cross_entropy(scores, labels).mean()
            return loss + cfg.decoder.l2_penalty * penalty

        return jax.jit(jax.grad(loss_fn)), jax.jit(
            jax.value_and_grad(loss_fn)
        )

    grad_f32_fn, vg_f32 = make_loss(model_f32)
    grad_bf16_fn, _ = make_loss(model_bf16)

    positives0, edges0, *_ = epoch_inputs(0)
    params = model_f32.init(
        {"params": jax.random.key(0)}, edges0, positives0[: args.ns]
    )
    tx = make_optimizer(
        cfg.training.optimiser.algorithm, cfg.training.optimiser.learn_rate,
        cfg.training.optimiser.weight_decay,
    )
    opt_state = tx.init(params)

    def flat_err(ga, gb):
        """(cosine, relative L2) over a leaf pair."""
        a = np.asarray(ga, np.float64).ravel()
        b = np.asarray(gb, np.float64).ravel()
        na, nb_ = np.linalg.norm(a), np.linalg.norm(b)
        if na == 0 and nb_ == 0:
            return 1.0, 0.0
        cos = float(a @ b / max(na * nb_, 1e-30))
        rel = float(np.linalg.norm(a - b) / max(na, 1e-30))
        return cos, rel

    records = []
    for step in range(args.steps + 1):
        inputs = epoch_inputs(step)
        if step % args.measure_every == 0:
            g32 = grad_f32_fn(params, *inputs)
            g16 = grad_bf16_fn(params, *inputs)
            leaves32 = jax.tree_util.tree_leaves_with_path(g32)
            leaves16 = jax.tree.leaves(g16)
            per_leaf = {}
            all32, all16 = [], []
            for (path, l32), l16 in zip(leaves32, leaves16):
                name = "/".join(
                    getattr(k, "key", str(k)) for k in path
                ).replace("params/", "")
                cos, rel = flat_err(l32, l16)
                per_leaf[name] = {"cos": round(cos, 6),
                                  "rel_l2": round(rel, 6)}
                all32.append(np.asarray(l32, np.float64).ravel())
                all16.append(np.asarray(l16, np.float64).ravel())
            cos_all, rel_all = flat_err(
                np.concatenate(all32), np.concatenate(all16)
            )
            records.append({"step": step, "cos": round(cos_all, 6),
                            "rel_l2": round(rel_all, 6),
                            "per_leaf": per_leaf})
            print(f"step {step}: cosine {cos_all:.6f} "
                  f"rel_l2 {rel_all:.4f} | " + " ".join(
                      f"{k}:{v['rel_l2']:.4f}"
                      for k, v in sorted(per_leaf.items())), flush=True)
        # advance the trajectory with the f32 gradient
        loss, g = vg_f32(params, *inputs)
        updates, opt_state = tx.update(g, opt_state, params)
        params = optax.apply_updates(params, updates)

    worst_rel = max(rec["rel_l2"] for rec in records)
    mean_cos = float(np.mean([rec["cos"] for rec in records]))
    print(json.dumps({
        "what": "probe_bf16_grads", "nodes": n, "rels": r, "d": args.d,
        "batch": args.batch, "ns": args.ns, "steps": args.steps,
        "mean_cosine": round(mean_cos, 6),
        "worst_rel_l2": round(worst_rel, 6),
        "records": records,
    }), flush=True)


if __name__ == "__main__":
    main()
