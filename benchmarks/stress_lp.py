#!/usr/bin/env python
"""Production-scale LP training stress test: 1M nodes / 10M triples on one
chip (an order of magnitude beyond the reference's largest LP dataset).

Exercises the full production path — background host pipeline
(edge-neighborhood sampling over 10M triples, per-epoch graph + layouts,
structured negatives) + the jitted step (basis encoder, scatter-free
decoder) — and reports step device time and epoch wall. Memory: embeddings
(1M × d) + adam states ≈ 1.5 GB at d=128; the sampled per-epoch subgraph
keeps the edge-stage working set bounded regardless of |E|.

    python benchmarks/stress_lp.py [--cpu] [--nodes 1000000] [--edges 10000000]
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
    ap.add_argument("--nodes", type=int, default=1_000_000)
    ap.add_argument("--rels", type=int, default=100)
    ap.add_argument("--edges", type=int, default=10_000_000)
    ap.add_argument("--batch", type=int, default=100_000)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--epochs", type=int, default=6)
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        from rgcn_tpu.utils.compile_cache import enable

        enable()

    import numpy as np

    from rgcn_tpu.config import load_experiment
    from rgcn_tpu.data.loaders import LinkPredictionData
    from rgcn_tpu.data.synthetic import synthetic_kg
    from rgcn_tpu.train.link_prediction import train_link_predictor
    from rgcn_tpu.utils.logging import ScalarLogger

    t0 = time.time()
    triples = synthetic_kg(args.nodes, args.rels, args.edges, seed=7)
    gen_s = time.time() - t0

    n2i = {f"e{i}": i for i in range(args.nodes)}
    r2i = {f"r{i}": i for i in range(args.rels)}
    data = LinkPredictionData(
        train=triples,
        test=triples[:64],  # nominal; evaluation is not the subject here
        all_triples=set(map(tuple, triples[:64])),
        n2i=n2i, i2n=list(n2i), r2i=r2i, i2r=list(r2i),
    )

    cfg = load_experiment(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "configs", "rgcn", "lp-WN18.yaml",
        )
    )
    import dataclasses

    cfg = dataclasses.replace(
        cfg,
        encoder=dataclasses.replace(
            cfg.encoder, node_embedding=args.dim, hidden1_size=args.dim
        ),
        training=dataclasses.replace(
            cfg.training, graph_batch_size=args.batch
        ),
        evaluation=dataclasses.replace(
            cfg.evaluation, check_every=10**9, batch_size=64
        ),
    )

    class Cap(ScalarLogger):
        def __init__(self):
            super().__init__(verbose=True)
            self.lines = []

        def info(self, msg):
            self.lines.append(msg)

    logger = Cap()
    t0 = time.time()
    train_link_predictor(cfg, data, logger=logger, max_epochs=args.epochs)
    wall = time.time() - t0
    for line in logger.lines:
        print(line, file=sys.stderr, flush=True)

    import re

    steps = [
        float(m.group(1))
        for m in (re.search(r"Step: ([0-9.]+)s", l) for l in logger.lines)
        if m
    ]
    tail = steps[2:] if len(steps) > 3 else steps
    print(json.dumps({
        "what": "stress_lp",
        "nodes": args.nodes, "edges": args.edges, "batch": args.batch,
        "dim": args.dim,
        "gen_s": round(gen_s, 1),
        "wall_s": round(wall, 1),
        "median_epoch_s": (
            round(sorted(tail)[len(tail) // 2], 3) if tail else None
        ),
    }), flush=True)


if __name__ == "__main__":
    main()
