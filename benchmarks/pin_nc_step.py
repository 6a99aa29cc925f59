#!/usr/bin/env python
"""Draw-search + executable pinning for the AM-scale NC trainer.

Same-program compile draws spread ~2x in long-chain truth at AM scale
(STATUS round 7: 595-1455 ms for one step program across processes).
``train_node_classifier(exe_cache_dir=..., exe_search=N)`` compiles N
draws on the first run, measures each with a chained runner, and pins
the fastest; every later process (or repeat) loads that executable in
milliseconds instead of re-compiling (minutes) and re-rolling.

This script demonstrates/validates the mechanism at AM scale: run it
once with ``--search N`` (slow: N remote compiles), then again without —
the second process must print the pinned-hit lines and step at the
searched draw's speed.

    python benchmarks/pin_nc_step.py --search 4 --cache /tmp/nc_exe
    python benchmarks/pin_nc_step.py --cache /tmp/nc_exe   # pinned run
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
    ap.add_argument("--nodes", type=int, default=300_000)
    ap.add_argument("--rels", type=int, default=266)
    ap.add_argument("--edges", type=int, default=1_000_000)
    ap.add_argument("--classes", type=int, default=11)
    ap.add_argument("--bases", type=int, default=40)
    ap.add_argument("--hidden", type=int, default=10)
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--search", type=int, default=0)
    ap.add_argument("--cache", default="/tmp/nc_exe_cache")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        from rgcn_tpu.utils.compile_cache import enable

        enable()

    from rgcn_tpu.config import load_experiment
    from rgcn_tpu.data.synthetic import synthetic_node_classification
    from rgcn_tpu.train.node_classification import train_node_classifier
    from rgcn_tpu.utils.logging import ScalarLogger

    t0 = time.time()
    data = synthetic_node_classification(
        num_nodes=args.nodes, num_rels=args.rels, num_edges=args.edges,
        num_classes=args.classes, labeled_frac=0.005, signal=0.7, seed=9,
    )
    print(f"data: N={data.num_nodes} R={data.num_relations} "
          f"E={len(data.triples)} ({time.time() - t0:.1f}s)", flush=True)

    cfg = load_experiment({
        "dataset": {"name": "synthetic"},
        "training": {"epochs": args.epochs,
                     "optimiser": {"algorithm": "adam",
                                   "learn_rate": 0.01,
                                   "weight_decay": 0.0}},
        "rgcn": {"model": "rgcn", "num_layers": 2,
                 "hidden_size": args.hidden,
                 "layer1_l2_penalty": 0.0005,
                 "decomposition": {"type": "basis",
                                   "num_bases": args.bases}},
        "evaluation": {"final_run": True},
    })
    logger = ScalarLogger()
    t0 = time.time()
    acc = train_node_classifier(
        cfg, data, seed=1, logger=logger, tile_size=512,
        exe_cache_dir=args.cache, exe_search=args.search,
    )
    print(json.dumps({
        "what": "pin_nc_step", "nodes": args.nodes, "search": args.search,
        "wall_s": round(time.time() - t0, 1), "test_acc": acc,
    }), flush=True)


if __name__ == "__main__":
    main()
