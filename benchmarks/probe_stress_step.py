#!/usr/bin/env python
"""Device-time attribution of the 1M-node in-jit LP step.

`benchmarks/stress_lp.py`'s epoch wall on the tunneled backend floors at
~0.19 s regardless of device-side changes — the floor is the per-epoch
positives transfer (+ the ~23 ms fetch RPC), so epoch walls cannot A/B
device work at this scale. This probe measures the STEP program itself
with device-resident inputs via the async-chain method (bench.py):

  * plain      — materialized [positives; negatives] batch scoring
                 (3(P+Ns) query gathers; AD backward scatters),
  * structured — layout-free structured scoring (3P+Ns gathers,
                 ops/pallas_distmult.py::distmult_structured_agg_ad with
                 layouts=None), the in-jit trainer's path since round 5.

Both variants build the graph in-jit with the same auto row block, so
the difference isolates the decoder. Steps are O(100 ms), so modest
chain lengths are safe (the >=60-iteration rule is for sub-ms ops).

    python benchmarks/probe_stress_step.py [--nodes 1000000] [--iters 8]
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
    ap.add_argument("--nodes", type=int, default=1_000_000)
    ap.add_argument("--rels", type=int, default=100)
    ap.add_argument("--batch", type=int, default=100_000)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--ns", type=int, default=10)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--only", default=None,
                    help="substring filter (each variant is a separate "
                         "multi-minute remote compile)")
    ap.add_argument("--ab", default=None,
                    help="comma list of variants to A/B with INTERLEAVED "
                         "chains (the only trustworthy cross-variant "
                         "comparison at this scale)")
    ap.add_argument("--rounds", type=int, default=4,
                    help="interleaved A/B rounds")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--no-canary", action="store_true",
                    help="skip the tunnel-health canary bracketing "
                         "(rgcn_tpu/utils/canary.py)")
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
    import functools

    import jax
    import jax.numpy as jnp
    import optax

    from rgcn_tpu.config import load_experiment
    from rgcn_tpu.data.synthetic import synthetic_kg
    from rgcn_tpu.graph.dynamic import (
        auto_layout_row_block,
        build_edge_set_dynamic,
    )
    from rgcn_tpu.train.link_prediction import build_lp_model
    from rgcn_tpu.train.negative import corrupt_batch, negative_structure
    from rgcn_tpu.train.optim import make_optimizer

    n, r, bsz, d, ns = args.nodes, args.rels, args.batch, args.dim, args.ns

    cfg = load_experiment(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs", "rgcn", "lp-WN18.yaml",
    ))
    cfg = dataclasses.replace(
        cfg,
        encoder=dataclasses.replace(
            cfg.encoder, node_embedding=d, hidden1_size=d
        ),
    )
    model = build_lp_model(cfg, n, r)

    pos_np = synthetic_kg(n, r, 2 * bsz, seed=7)[:bsz]
    positives = jnp.asarray(np.asarray(pos_np, dtype=np.int64))

    rb = auto_layout_row_block(n, 2 * bsz, chunk=128)
    print(f"probe_stress: N={n} B={bsz} ns={ns} d={d} row_block={rb}",
          flush=True)

    tx = make_optimizer("adam", 0.01)

    def _perturb(params, loss):
        # bounded data-dependence for forward-only chains (probe_stress_nc)
        leaves, treedef = jax.tree.flatten(params)
        i = min(range(len(leaves)), key=lambda j: leaves[j].size)
        leaves[i] = leaves[i] + loss.astype(leaves[i].dtype) * 1e-12
        return jax.tree.unflatten(treedef, leaves)

    def make_step(structured, fwd_only=False, encoder_only=False):
        """Variants beyond plain/structured isolate the in-jit decoder
        backward (VERDICT r04 #7):

        * ``fwd``     — structured forward only (no grad, no adam):
                        step − fwd = backward + adam.
        * ``encgrad`` — full grad step whose loss is the encoder output
                        sum (no decoder): structured − encgrad = the
                        decoder's fwd+bwd share (graph build + encoder
                        fwd/bwd + adam are common terms).
        * ``fwd_enc`` — encoder forward only: (structured − fwd) −
                        (encgrad − fwd_enc) ≈ the decoder BACKWARD alone.
        """
        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def step(params, opt_state, positives, key):
            k_neg, k_drop, k_sl = jax.random.split(key, 3)
            edges = build_edge_set_dynamic(
                positives, n, r, tile_size=128,
                dropout_rate=0.5, dropout_key=k_drop,
                with_dst_layout=True, row_block=rb,
            )
            if encoder_only:
                def loss_fn(p):
                    nodes = model.apply(
                        p, edges, deterministic=False,
                        rngs={"dropout": k_sl}, method=model.encode,
                    )
                    return jnp.sum(nodes) * 1e-6

                if fwd_only:
                    loss = loss_fn(params)
                    return _perturb(params, loss), opt_state, loss
                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state2 = tx.update(grads, opt_state, params)
                return (optax.apply_updates(params, updates), opt_state2,
                        loss)
            if structured:
                ce, ch, labels = negative_structure(
                    k_neg, positives, n, ns, 0.5
                )
                total = labels.shape[0]
                pw = jnp.full((total,), 1.0 / total, jnp.float32)

                def loss_fn(p):
                    scores, penalty = model.apply(
                        p, edges, positives, ch, ce, pw, None,
                        method=model.structured_scores,
                        deterministic=False, rngs={"dropout": k_sl},
                    )
                    loss = optax.sigmoid_binary_cross_entropy(
                        scores, labels).mean()
                    return loss + cfg.decoder.l2_penalty * penalty
            else:
                batch, labels = corrupt_batch(k_neg, positives, n, ns, 0.5)

                def loss_fn(p):
                    scores, penalty = model.apply(
                        p, edges, batch,
                        deterministic=False, rngs={"dropout": k_sl},
                    )
                    loss = optax.sigmoid_binary_cross_entropy(
                        scores, labels).mean()
                    return loss + cfg.decoder.l2_penalty * penalty

            if fwd_only:
                loss = loss_fn(params)
                return _perturb(params, loss), opt_state, loss
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state2 = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state2, loss

        return step

    def fresh_state():
        params = model.init(
            {"params": jax.random.key(1), "dropout": jax.random.key(2)},
            build_edge_set_dynamic(positives, n, r, tile_size=128),
            positives,
        )
        return params, tx.init(params)

    def chain(step, iters):
        params, opt_state = fresh_state()
        key = jax.random.key(3)
        # warm (compile)
        t0 = time.time()
        params, opt_state, loss = step(params, opt_state, positives, key)
        float(loss)
        print(f"  compile+first: {time.time() - t0:.1f}s", flush=True)

        def run(k):
            nonlocal params, opt_state
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(k):
                    params, opt_state, loss = step(
                        params, opt_state, positives, key
                    )
                float(loss)
                ts.append(time.perf_counter() - t0)
            return min(ts)

        return (run(1 + iters) - run(1)) / iters

    def chain_interleaved(named_steps, iters, rounds):
        """Interleaved A/B (see probe_stress_nc.py's docstring: at stress
        scale one-shot chains absorb whole cross-tenant congestion bursts
        — only alternating chains with per-variant mins compare fairly)."""
        states = {}
        for name, step in named_steps.items():
            params, opt_state = fresh_state()
            t0 = time.time()
            params, opt_state, loss = step(
                params, opt_state, positives, jax.random.key(3)
            )
            float(loss)
            print(f"  [{name}] compile+first: {time.time() - t0:.1f}s",
                  flush=True)
            states[name] = [step, params, opt_state]

        def run(name, k):
            step, params, opt_state = states[name]
            key = jax.random.key(3)
            t0 = time.perf_counter()
            for _ in range(k):
                params, opt_state, loss = step(
                    params, opt_state, positives, key
                )
            float(loss)
            states[name][1:] = [params, opt_state]
            return time.perf_counter() - t0

        best = {name: float("inf") for name in named_steps}
        for rnd in range(rounds):
            for name in named_steps:
                dt = (run(name, 1 + iters) - run(name, 1)) / iters
                best[name] = min(best[name], dt)
                print(f"  [round {rnd}] {name}: {dt * 1e3:.1f} ms/step "
                      f"(best {best[name] * 1e3:.1f})", flush=True)
        return {k: round(v * 1e3, 1) for k, v in best.items()}

    variants = {
        "plain": dict(structured=False),
        "structured": dict(structured=True),
        "fwd": dict(structured=True, fwd_only=True),
        "encgrad": dict(structured=True, encoder_only=True),
        "fwd_enc": dict(structured=True, fwd_only=True,
                        encoder_only=True),
    }
    results = {}
    if args.ab:
        named = {
            name: make_step(**variants[name])
            for name in args.ab.split(",")
        }
        results = chain_interleaved(named, args.iters, args.rounds)
        for name, ms in results.items():
            print(f"  {name}: {ms} ms/step (interleaved min)", flush=True)
    else:
        for name, kw in variants.items():
            if args.only and args.only not in name:
                continue
            dt = chain(make_step(**kw), args.iters)
            results[name] = round(dt * 1e3, 1)
            print(f"  {name}: {dt * 1e3:.1f} ms/step", flush=True)

    if canary:
        from rgcn_tpu.utils.canary import measure_canary

        canary["after"] = measure_canary(tag="after")
        if not (canary["before"].get("healthy")
                and canary["after"].get("healthy")):
            print(
                "probe_stress_step: WARNING — canary above its floor gate "
                "on at least one side of the campaign; numbers are "
                "congestion-suspect",
                file=sys.stderr, flush=True,
            )
    print(json.dumps({"what": "probe_stress_step", "nodes": n,
                      "batch": bsz, "ns": ns, "dim": d, "row_block": rb,
                      "ms_per_step": results,
                      **({"canary": canary} if canary else {})}),
          flush=True)


if __name__ == "__main__":
    main()
