#!/usr/bin/env python
"""AM-scale node-classification stress: 300k nodes / 266 relations / 1M
triples, featureless 40-basis R-GCN (the reference's largest NC
configuration, `configs/rgcn/nc-AM.yaml`) — full-batch training on one
chip. Round 1 validated this scale on CPU only (95 s end-to-end); this
measures the real-chip step.

    python benchmarks/stress_nc.py [--cpu] [--epochs 12]
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
    ap.add_argument("--nodes", type=int, default=300_000)
    ap.add_argument("--rels", type=int, default=266)
    ap.add_argument("--edges", type=int, default=1_000_000)
    ap.add_argument("--labeled", type=int, default=1_000)
    ap.add_argument("--classes", type=int, default=11)
    ap.add_argument("--epochs", type=int, default=12)
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
    from rgcn_tpu.graph.structure import build_edge_set
    from rgcn_tpu.models import NodeClassifier
    from rgcn_tpu.train.optim import make_optimizer

    t0 = time.time()
    triples = synthetic_kg(args.nodes, args.rels, args.edges, seed=9)
    from rgcn_tpu.graph.structure import auto_nc_row_block

    es = build_edge_set(
        triples, args.nodes, args.rels, tile_size=512, with_dst_layout=True,
        with_pair_index=True, with_pair_agg=True,
        layout_row_block=auto_nc_row_block(args.nodes),
    )
    # one-time transfer: jit re-transfers numpy argument leaves per call
    # (a host->device RPC per epoch on the tunnel, probe_amctx)
    es = jax.device_put(es)
    prep_s = time.time() - t0

    rng = np.random.default_rng(9)
    idx = jnp.asarray(rng.choice(args.nodes, args.labeled, replace=False))
    lbl = jnp.asarray(rng.integers(0, args.classes, args.labeled))

    model = NodeClassifier(
        num_nodes=args.nodes, num_relations=args.rels,
        num_classes=args.classes, hidden_size=10, num_layers=2,
        decomposition="basis", num_bases=40,
    )
    t0 = time.time()
    params = model.init(jax.random.key(0), es)
    tx = make_optimizer("adam", 0.01)
    opt_state = tx.init(params)

    # pass the EdgeSet as an argument — closure constants at this scale
    # blow past the remote-compile request limit (HTTP 413) and bloat the
    # program on any backend
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

    losses = []
    epoch_times = []
    for e in range(args.epochs):
        t1 = time.time()
        params, opt_state, loss = step(params, opt_state, es)
        losses.append(float(loss))  # sync
        epoch_times.append(time.time() - t1)
    train_s = time.time() - t0

    tail = sorted(epoch_times[2:]) if len(epoch_times) > 3 else epoch_times
    print(json.dumps({
        "what": "stress_nc_am_scale",
        "nodes": args.nodes, "rels": args.rels, "edges": args.edges,
        "prep_s": round(prep_s, 1),
        "train_s": round(train_s, 1),
        "median_epoch_s": round(tail[len(tail) // 2], 3),
        "loss_first": round(losses[0], 4), "loss_last": round(losses[-1], 4),
    }), flush=True)
    assert np.isfinite(losses[-1])


if __name__ == "__main__":
    main()
