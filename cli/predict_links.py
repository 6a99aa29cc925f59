#!/usr/bin/env python
"""Link-prediction experiment runner.

Equivalent of ``/root/reference/experiments/predict_links.py`` (sacred CLI →
argparse):

    python cli/predict_links.py --config configs/rgcn/lp-WN18.yaml

``--synthetic`` substitutes a generated dataset of matching scale when the
real triple files are absent (this container has no network egress).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True, help="YAML experiment config")
    ap.add_argument("--epochs", type=int, default=None, help="override epochs")
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--run-dir", default=None, help="write metrics.jsonl here")
    ap.add_argument("--synthetic", action="store_true",
                    help="use a synthetic dataset of matching scale")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--tile-size", type=int, default=128)
    ap.add_argument("--profile-dir", default=None,
                    help="write a jax.profiler device trace here")
    ap.add_argument("--checkpoint-dir", default=None,
                    help="save/resume params+optimizer state here")
    ap.add_argument("--checkpoint-every", type=int, default=None,
                    help="save cadence in epochs (default: eval check_every)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        # persistent compile cache (minutes-slow remote compiles); CPU runs
        # skip it — cached CPU AOT artifacts can carry mismatched machine
        # features
        from rgcn_tpu.utils.compile_cache import enable as _enable_cache

        _enable_cache()

    from rgcn_tpu.config import load_experiment, LinkPredictionExperiment
    from rgcn_tpu.train.link_prediction import train_link_predictor
    from rgcn_tpu.utils.logging import ScalarLogger

    import os
    if not os.path.isfile(args.config):
        ap.error(f"config file not found: {args.config}")
    cfg = load_experiment(args.config)
    if not isinstance(cfg, LinkPredictionExperiment):
        ap.error(f"{args.config} is not a link-prediction config")

    if args.synthetic:
        from rgcn_tpu.data.synthetic import (
            fb_toy_like,
            synthetic_link_prediction,
            wn18_like,
        )

        name = cfg.dataset.name.lower()
        if name == "wn18":
            data = wn18_like()
        elif name == "fb-toy":
            data = fb_toy_like()
        else:
            data = synthetic_link_prediction(seed=0)
        print(
            f"[synthetic] {cfg.dataset.name}-like graph: "
            f"N={data.num_nodes} R={data.num_relations} E={len(data.train)}"
        )
    else:
        from rgcn_tpu.data.loaders import load_link_prediction

        data = load_link_prediction(
            cfg.dataset.name,
            final_run=cfg.evaluation.final_run,
            data_root=args.data_root,
        )

    logger = ScalarLogger(run_dir=args.run_dir, name="link_pred")
    from rgcn_tpu.utils.profiling import trace

    with trace(args.profile_dir, enabled=args.profile_dir is not None):
        train_link_predictor(
            cfg, data, logger=logger, tile_size=args.tile_size,
            max_epochs=args.epochs, checkpoint_dir=args.checkpoint_dir,
            checkpoint_every=args.checkpoint_every,
        )


if __name__ == "__main__":
    main()
