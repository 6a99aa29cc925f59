#!/usr/bin/env python
"""Node-classification serving endpoint (checkpoint -> class queries).

Companion to ``cli/classify_nodes.py``: train with ``--checkpoint-dir``,
then answer class queries from the checkpoint:

    python cli/serve_nodes.py --config configs/rgcn/nc-AIFB.yaml \
        --checkpoint-dir /tmp/ck --nodes person1 person2 42

Node arguments accept vocabulary names or integer ids; without ``--nodes``
the first test nodes are classified as a demonstration. One full forward
runs at load; every query is a table lookup.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True)
    ap.add_argument("--checkpoint-dir", required=True)
    ap.add_argument("--nodes", nargs="*", default=None,
                    help="node names or integer ids to classify")
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tile-size", type=int, default=128)
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        from rgcn_tpu.utils.compile_cache import enable as _enable_cache

        _enable_cache()

    import numpy as np

    from rgcn_tpu.config import NodeClassificationExperiment, load_experiment
    from rgcn_tpu.serve import load_nc_server

    if not os.path.isfile(args.config):
        ap.error(f"config file not found: {args.config}")
    cfg = load_experiment(args.config)
    if not isinstance(cfg, NodeClassificationExperiment):
        ap.error(f"{args.config} is not a node-classification config")

    from rgcn_tpu.data.dispatch import load_nc_data

    data = load_nc_data(cfg, args.synthetic, data_root=args.data_root)

    srv = load_nc_server(cfg, data, args.checkpoint_dir,
                         tile_size=args.tile_size)
    if srv is None:
        ap.error(f"no checkpoint found under {args.checkpoint_dir}")

    if args.nodes:
        ids = [
            data.n2i[tok] if tok in data.n2i else int(tok)
            for tok in args.nodes
        ]
    else:
        ids = [data.n2i[n] for n in list(data.test)[:8]]

    classes = srv.classify(ids)
    probs = srv.probabilities(ids)
    for nid, c, p in zip(ids, classes, probs):
        name = data.i2n[nid] if nid < len(data.i2n) else str(nid)
        print(f"{name}: class {c} (p={p[c]:.3f})")


if __name__ == "__main__":
    main()
