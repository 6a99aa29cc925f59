#!/usr/bin/env python
"""Device-time attribution of the AM-scale NC train step.

`benchmarks/stress_nc.py` reports epoch WALLS, which on the tunneled
backend track tunnel health, not device work (CLAUDE.md). This probe
measures the full-batch NC STEP program (featureless 40-basis layer 1 +
featureful basis layer 2, CE + layer-1 L2, adam) with device-resident
inputs via the async-chain method, A/B-ing the featureless-basis message
path:

  * plain — per-edge tile-group contraction of gathered basis rows
            (the (E, nb, dout) gather under jax.checkpoint),
  * pairs — unique-(src, rel) pre-contraction (graph/structure.py::
            build_src_rel_pairs): ~2.5x fewer wide-row gathers and
            backward scatter rows at this scale, plus a cheap (E, dout)
            fan-out gather from the computed pair-message table.

Steps are O(100 ms); modest chain lengths are safe (the >=60-iteration
rule is for sub-ms ops).

    python benchmarks/probe_stress_nc.py [--iters 8] [--only pairs]
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
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--only", default=None,
                    help="substring filter (each variant is a separate "
                         "multi-minute remote compile)")
    ap.add_argument("--cpu", action="store_true")
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
    import optax

    from rgcn_tpu.data.synthetic import synthetic_kg
    from rgcn_tpu.graph.structure import build_edge_set
    from rgcn_tpu.models import NodeClassifier
    from rgcn_tpu.train.optim import make_optimizer

    t0 = time.time()
    triples = synthetic_kg(args.nodes, args.rels, args.edges, seed=9)
    from rgcn_tpu.graph.structure import auto_nc_row_block

    es_pairs = build_edge_set(
        triples, args.nodes, args.rels, tile_size=512,
        with_dst_layout=True, with_pair_index=True,
        layout_row_block=auto_nc_row_block(args.nodes),
    )
    es_plain = dataclasses.replace(es_pairs, pairs=None)
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

    @jax.jit
    def step(params, opt_state, es):
        def loss_fn(p):
            logits = model.apply(p, es)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits[idx], lbl
            ).mean() + 5e-4 * model.layer1_l2(p)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), new_opt, loss

    def chain(es, iters):
        params = model.init(jax.random.key(0), es)
        opt_state = tx.init(params)
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

    results = {}
    for name, es in (("plain", es_plain), ("pairs", es_pairs)):
        if args.only and args.only not in name:
            continue
        dt = chain(es, args.iters)
        results[name] = round(dt * 1e3, 1)
        print(f"  {name}: {dt * 1e3:.1f} ms/step", flush=True)

    # ------------------------------------------------------------------
    # Component attribution (steps are seconds here, so per-call sync
    # timing is fine — the ~23 ms fetch RPC is noise at this scale).
    # ------------------------------------------------------------------
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
        "ms_per_step": results,
    }), flush=True)


if __name__ == "__main__":
    main()
