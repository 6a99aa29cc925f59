#!/usr/bin/env python
"""shard_map overhead on hardware: the sharded LP step on a 1-device mesh
vs the equivalent unsharded in-jit step, WN18 scale.

`make tpu-smoke` proves the sharded Pallas program COMPILES under real
Mosaic and matches the XLA backend numerically; this probe adds the PERF
side of the multi-chip story: what the shard_map program structure itself
costs relative to the plain jit formulation (same in-jit graph build,
same backend, same shapes). On a real pod the per-shard edge slice
shrinks with the mesh; the 1-device overhead bounds the fixed cost.

MEASURED (v5e, WN18 scale, 40-iter chains, 2026-08-18, after the review
fixed two confounded baselines — the in-jit single side originally ran
the XLA-encoder fallback, and the hosted sides ran different row
blocks): in-jit sharded 65.4 ms vs 57.1 unsharded SAME-backend (+14.5%,
both building Pallas layouts in-jit); HOSTED sharded 49.9 ms vs 50.7
single-device on identical host-built inputs and geometry (-1.5%) — the
production multi-chip shape pays no measurable shard_map overhead;
HOSTED STRUCTURED sharded (the sharded production decoder,
`make_sharded_lp_step_hosted_structured`) 23.6-23.7 ms — 2.1x the plain
hosted sharded step on the same workload.

    python benchmarks/probe_shard_overhead.py [--iters 40]
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
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--small", action="store_true",
                    help="tiny scale (CPU smoke, not the official number)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        from rgcn_tpu.utils.compile_cache import enable

        enable()

    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import Mesh

    from rgcn_tpu.data.synthetic import synthetic_kg
    from rgcn_tpu.dist.mesh import EDGE_AXIS
    from rgcn_tpu.dist.train import make_sharded_lp_step
    from rgcn_tpu.graph.dynamic import build_edge_set_dynamic
    from rgcn_tpu.models import LinkPredictor
    from rgcn_tpu.train.negative import corrupt_batch
    from rgcn_tpu.train.optim import make_optimizer

    if args.small:
        n, r, bsz, num_neg, tile, dim = 500, 6, 128, 3, 32, 16
    else:
        n, r, bsz, num_neg, tile, dim = 40_943, 18, 30_000, 10, 128, 200
    triples = synthetic_kg(n, r, 3 * bsz, seed=1)
    positives = jnp.asarray(np.asarray(triples[:bsz]))

    kwargs = dict(
        num_nodes=n, num_relations=r, emb_dim=dim, hidden1_size=dim,
        num_layers=1, weight_init="schlichtkrull-normal", bias_init="zeros",
        decoder_l2_type="schlichtkrull-l2", decoder_l2=0.01,
        decomposition="basis", num_bases=2,
    )
    model_s = LinkPredictor(axis_name=EDGE_AXIS, backend="pallas", **kwargs)
    model_1 = LinkPredictor(backend="pallas", **kwargs)

    init_edges = build_edge_set_dynamic(positives, n, r, tile_size=tile)
    params = model_1.init(
        {"params": jax.random.key(1)}, init_edges, positives
    )
    tx = make_optimizer("sgd", 0.01)
    key = jax.random.key(9)

    @jax.jit
    def single_step(params, opt_state):
        k_neg, _, _, _ = jax.random.split(key, 4)
        batch, labels = corrupt_batch(k_neg, positives, n, num_neg, 0.5)
        # with_dst_layout: build the in-jit Pallas layouts like the
        # sharded side does — without them the 'pallas' model silently
        # falls back to the XLA encoder and the A/B compares BACKENDS,
        # not shard_map structure (round-4 review finding)
        edges = build_edge_set_dynamic(
            positives, n, r, tile_size=tile, with_dst_layout=True,
        )

        def loss_fn(p):
            scores, penalty = model_1.apply(
                p, edges, batch, deterministic=True
            )
            return (
                optax.sigmoid_binary_cross_entropy(scores, labels).mean()
                + 0.01 * penalty
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    mesh1 = Mesh(np.array(jax.devices()[:1]), (EDGE_AXIS,))
    sharded = make_sharded_lp_step(
        model_s, tx, mesh1,
        num_nodes=n, num_rels=r, tile_size=tile,
        num_negatives=num_neg, head_prob=0.5,
        decoder_l2_weight=0.01, backend="pallas", row_block=256,
    )

    def sharded_step(params, opt_state):
        p2, o2, _loss = sharded(params, opt_state, positives, key)
        return p2, o2

    def chain(step):
        def sync(s):
            float(jax.tree.leaves(s[0])[0].reshape(-1)[0])

        def measure(k):
            s = step(params, tx.init(params))
            sync(s)
            ts = []
            for _ in range(3):
                s = (params, tx.init(params))
                t0 = time.perf_counter()
                for _ in range(k):
                    s = step(*s)
                sync(s)
                ts.append(time.perf_counter() - t0)
            return min(ts)

        return (measure(2 + args.iters) - measure(2)) / args.iters

    results = {}
    results["single_ms"] = round(chain(single_step) * 1e3, 3)
    print(f"single: {results['single_ms']} ms", file=sys.stderr, flush=True)
    results["sharded_1dev_ms"] = round(chain(sharded_step) * 1e3, 3)
    print(f"sharded: {results['sharded_1dev_ms']} ms", file=sys.stderr,
          flush=True)
    results["single2_ms"] = round(chain(single_step) * 1e3, 3)
    results["overhead_pct"] = round(
        100.0 * (results["sharded_1dev_ms"]
                 / min(results["single_ms"], results["single2_ms"]) - 1.0), 1
    )

    # --- hosted (production multi-chip shape): host-built per-shard
    # layouts + host-drawn batch, transferred ONCE and chained — isolates
    # the shard_map program-structure cost without the in-jit sorts ---
    from rgcn_tpu.dist.host import build_sharded_epoch_host
    from rgcn_tpu.dist.train import make_sharded_lp_step_hosted
    from rgcn_tpu.graph.dynamic import build_edge_set_dynamic_host
    from rgcn_tpu.train.negative import corrupt_batch_host

    pos_np = np.asarray(triples[:bsz])
    batch_h, labels_h = corrupt_batch_host(
        np.random.default_rng(3), pos_np, n, num_neg, 0.5
    )
    # identical layout geometry on BOTH sides — build_sharded_epoch_host
    # auto-escalates the row block on TPU, and an rb mismatch is itself a
    # measured ~20% encoder effect that would confound the shard_map A/B
    from rgcn_tpu.graph.dynamic import auto_layout_row_block

    rb_h = auto_layout_row_block(n, 2 * bsz) \
        if jax.default_backend() in ("tpu", "axon") else 128
    es_h = build_edge_set_dynamic_host(
        pos_np, n, r, tile_size=tile, with_dst_layout=True,
        row_block=rb_h, layout_chunk=256,
    )
    stacked = jax.device_put(jax.tree.map(
        jnp.asarray,
        build_sharded_epoch_host(pos_np, n, r, tile, 1, row_block=rb_h,
                                 layout_chunk=256),
    ))
    batch_j = jnp.asarray(batch_h)
    labels_j = jnp.asarray(labels_h)

    es_hj = jax.device_put(jax.tree.map(jnp.asarray, es_h))

    # big inputs as jit ARGUMENTS, not closure constants (CLAUDE.md:
    # constants serialize into the remote-compile request)
    @jax.jit
    def _single_hosted(params, opt_state, es_, batch_, labels_):
        def loss_fn(p):
            scores, pen = model_1.apply(p, es_, batch_)
            return (
                optax.sigmoid_binary_cross_entropy(scores, labels_).mean()
                + 0.01 * pen
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    def single_hosted(params, opt_state):
        return _single_hosted(params, opt_state, es_hj, batch_j, labels_j)

    hosted = make_sharded_lp_step_hosted(
        model_s, tx, mesh1, num_nodes=n, decoder_l2_weight=0.01,
    )

    def hosted_step(params, opt_state):
        p2, o2, _loss = hosted(
            params, opt_state, stacked, batch_j, labels_j, key
        )
        return p2, o2

    results["single_hosted_ms"] = round(chain(single_hosted) * 1e3, 3)
    print(f"single hosted: {results['single_hosted_ms']} ms",
          file=sys.stderr, flush=True)
    results["hosted_sharded_1dev_ms"] = round(chain(hosted_step) * 1e3, 3)
    results["hosted_overhead_pct"] = round(
        100.0 * (results["hosted_sharded_1dev_ms"]
                 / results["single_hosted_ms"] - 1.0), 1
    )
    print(f"hosted sharded: {results['hosted_sharded_1dev_ms']} ms",
          file=sys.stderr, flush=True)

    # --- hosted STRUCTURED (the sharded production decoder: 3P+Ns
    # gathers, sorted scatter-free backward, per-shard layouts) ---
    from rgcn_tpu.dist.host import build_sharded_structured_host
    from rgcn_tpu.dist.train import make_sharded_lp_step_hosted_structured
    from rgcn_tpu.train.negative import corrupt_batch_host as _cbh

    ch_np, ce_np = _cbh(
        np.random.default_rng(3), pos_np, n, num_neg, 0.5,
        structure_only=True,
    )
    structured = jax.device_put(jax.tree.map(
        jnp.asarray,
        build_sharded_structured_host(pos_np, ch_np, ce_np, n, 1),
    ))
    hosted_st = make_sharded_lp_step_hosted_structured(
        model_s, tx, mesh1, decoder_l2_weight=0.01, num_nodes=n,
    )

    def hosted_st_step(params, opt_state):
        p2, o2, _loss = hosted_st(params, opt_state, stacked, structured,
                                  key)
        return p2, o2

    results["hosted_structured_1dev_ms"] = round(
        chain(hosted_st_step) * 1e3, 3
    )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
