#!/usr/bin/env python
"""Train-step throughput harness: full NC / LP step time at configurable
scale, using the honest async-chain methodology (see bench.py). One JSON
line per configuration.

    python benchmarks/train_step.py [--cpu] [--quick]
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
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--iters", type=int, default=20)
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
    import optax

    from rgcn_tpu.data.synthetic import synthetic_kg
    from rgcn_tpu.graph.dynamic import build_edge_set_dynamic
    from rgcn_tpu.graph.structure import build_edge_set
    from rgcn_tpu.models import LinkPredictor, NodeClassifier
    from rgcn_tpu.train.negative import corrupt_batch
    from rgcn_tpu.train.optim import make_optimizer

    if args.quick:
        nc_n, nc_r, nc_e = 2000, 12, 10000
        lp_n, lp_r, lp_b = 2000, 12, 1024
    else:
        nc_n, nc_r, nc_e = 8285, 45, 29000      # AIFB scale
        lp_n, lp_r, lp_b = 40943, 18, 30000     # WN18 scale

    rng = np.random.default_rng(0)

    def chain_time(step_fn, fetch, *state, iters):
        """step_fn(state) -> state; fetch(state) -> float forces sync."""
        def run(k):
            s = state
            s = step_fn(*s)
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

    # --- NC full-batch step (AIFB scale, basis) ---
    triples = synthetic_kg(nc_n, nc_r, nc_e, seed=0)
    es = build_edge_set(triples, nc_n, nc_r, tile_size=128,
                        with_dst_layout=True)
    model = NodeClassifier(
        num_nodes=nc_n, num_relations=nc_r, num_classes=4, hidden_size=16,
        decomposition="basis", num_bases=8,
    )
    params = model.init(jax.random.key(0), es)
    tx = make_optimizer("adam", 0.01)
    opt_state = tx.init(params)
    idx = jnp.asarray(rng.choice(nc_n, 128, replace=False))
    lbl = jnp.asarray(rng.integers(0, 4, 128))

    @jax.jit
    def nc_step(params, opt_state):
        def loss_fn(p):
            logits = model.apply(p, es)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits[idx], lbl
            ).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), opt_state

    t = chain_time(
        nc_step,
        lambda s: float(jax.tree.leaves(s[0])[0].reshape(-1)[0]),
        params, opt_state, iters=args.iters,
    )
    results["nc_step_ms"] = round(t * 1e3, 3)

    # --- LP step (WN18 scale, basis, in-jit graph build) ---
    lp_triples = synthetic_kg(lp_n, lp_r, 5 * lp_b, seed=1)[: 2 * lp_b]
    model = LinkPredictor(
        num_nodes=lp_n, num_relations=lp_r, emb_dim=200, hidden1_size=200,
        num_layers=1, decomposition="basis", num_bases=2,
        weight_init="schlichtkrull-normal", bias_init="zeros",
        decoder_l2_type="schlichtkrull-l2", decoder_l2=0.01,
    )
    pos0 = jnp.asarray(lp_triples[:lp_b])
    edges0 = build_edge_set_dynamic(pos0, lp_n, lp_r, tile_size=128)
    lp_params = model.init({"params": jax.random.key(1)}, edges0, pos0)
    lp_opt = tx.init(lp_params)

    @jax.jit
    def lp_step(params, opt_state, key):
        k_neg, k_drop, key = jax.random.split(key, 3)
        batch, labels = corrupt_batch(k_neg, pos0, lp_n, 10, 0.5)
        edges = build_edge_set_dynamic(
            pos0, lp_n, lp_r, tile_size=128,
            dropout_rate=0.5, dropout_key=k_drop,
            with_dst_layout=jax.default_backend() in ("tpu", "axon"),
        )

        def loss_fn(p):
            scores, pen = model.apply(p, edges, batch)
            return (
                optax.sigmoid_binary_cross_entropy(scores, labels).mean()
                + 0.01 * pen
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, key

    t = chain_time(
        lp_step,
        lambda s: float(jax.tree.leaves(s[0])[0].reshape(-1)[0]),
        lp_params, lp_opt, jax.random.key(2), iters=args.iters,
    )
    results["lp_step_ms"] = round(t * 1e3, 3)

    # --- LP step, in-jit STRUCTURED decoder (the trainer's in-jit path
    # since round 5: layout-free structured scoring — 3P+Ns query gathers,
    # plain-AD backward — plus the auto-scaled layout row block) ---
    from rgcn_tpu.graph.dynamic import auto_layout_row_block as _arb
    from rgcn_tpu.train.negative import negative_structure

    _rb_ij = _arb(lp_n, 2 * lp_b, chunk=128)

    @jax.jit
    def lp_step_structured_injit(params, opt_state, key):
        k_neg, k_drop, key = jax.random.split(key, 3)
        ce, ch, labels = negative_structure(k_neg, pos0, lp_n, 10, 0.5)
        pw = jnp.full((labels.shape[0],), 1.0 / labels.shape[0], jnp.float32)
        edges = build_edge_set_dynamic(
            pos0, lp_n, lp_r, tile_size=128,
            dropout_rate=0.5, dropout_key=k_drop,
            with_dst_layout=jax.default_backend() in ("tpu", "axon"),
            row_block=_rb_ij,
        )

        def loss_fn(p):
            scores, pen = model.apply(
                p, edges, pos0, ch, ce, pw, None,
                method=model.structured_scores,
            )
            return (
                optax.sigmoid_binary_cross_entropy(scores, labels).mean()
                + 0.01 * pen
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, key

    t = chain_time(
        lp_step_structured_injit,
        lambda s: float(jax.tree.leaves(s[0])[0].reshape(-1)[0]),
        lp_params, lp_opt, jax.random.key(2), iters=args.iters,
    )
    results["lp_step_structured_injit_ms"] = round(t * 1e3, 3)

    # --- LP step with HOST-built graph + host negatives + host scoring
    # layouts (the production training path: everything overlaps device
    # execution in the epoch pipeline; decoder backward is scatter-free) ---
    from rgcn_tpu.graph.dynamic import build_edge_set_dynamic_host
    from rgcn_tpu.ops.pallas_distmult import build_batch_layouts
    from rgcn_tpu.train.negative import corrupt_batch_host

    on_accel = jax.default_backend() in ("tpu", "axon")
    from rgcn_tpu.graph.dynamic import auto_layout_row_block

    es_host = build_edge_set_dynamic_host(
        np.asarray(pos0), lp_n, lp_r, tile_size=128,
        dropout_rate=0.5, dropout_rng=np.random.default_rng(3),
        with_dst_layout=on_accel,
        row_block=auto_layout_row_block(lp_n, 2 * len(np.asarray(pos0))),
        layout_chunk=256,
    )
    from rgcn_tpu.ops.pallas_distmult import build_structured_layouts

    batch_h, labels_h, ch_h, ce_h = corrupt_batch_host(
        np.random.default_rng(4), np.asarray(pos0), lp_n, 10, 0.5,
        return_structure=True,
    )
    if on_accel:
        st_lays = build_structured_layouts(
            np.asarray(pos0), ce_h, lp_n, row_block=512, chunk=256,
            sorted_corrupt=True, corrupt_head=ch_h,
        )
    else:
        st_lays = None
    labels_h = jnp.asarray(labels_h)
    ch_h = jnp.asarray(ch_h)
    ce_h = jnp.asarray(ce_h)
    pw_h = jnp.full((labels_h.shape[0],), 1.0 / labels_h.shape[0], jnp.float32)
    batch_h = jnp.asarray(batch_h)

    @jax.jit
    def lp_step_host(params, opt_state, key):
        def loss_fn(p):
            if st_lays is not None:
                scores, pen = model.apply(
                    p, es_host, pos0, ch_h, ce_h, pw_h, st_lays,
                    method=model.structured_scores,
                )
            else:
                scores, pen = model.apply(p, es_host, batch_h)
            return (
                optax.sigmoid_binary_cross_entropy(scores, labels_h).mean()
                + 0.01 * pen
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, key

    t = chain_time(
        lp_step_host,
        lambda s: float(jax.tree.leaves(s[0])[0].reshape(-1)[0]),
        lp_params, lp_opt, jax.random.key(4), iters=args.iters,
    )
    results["lp_step_hostbuild_ms"] = round(t * 1e3, 3)
    t0 = time.time()
    for i in range(5):
        build_edge_set_dynamic_host(
            np.asarray(pos0), lp_n, lp_r, tile_size=128,
            dropout_rate=0.5, dropout_rng=np.random.default_rng(i),
            with_dst_layout=True, row_block=128, layout_chunk=256,
        )
    results["host_build_ms"] = round((time.time() - t0) / 5 * 1e3, 1)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
