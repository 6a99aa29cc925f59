#!/usr/bin/env python
"""Node-classification experiment runner.

Equivalent of ``/root/reference/experiments/classify_nodes.py`` (sacred CLI →
argparse):

    python cli/classify_nodes.py --config configs/rgcn/nc-AIFB.yaml

``--synthetic`` substitutes a generated dataset of comparable scale when the
real RDF files are absent (this container has no network egress).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True, help="YAML experiment config")
    ap.add_argument("--repeats", type=int, default=None)
    ap.add_argument("--epochs", type=int, default=None, help="override epochs")
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--run-dir", default=None, help="write metrics.jsonl here")
    ap.add_argument("--synthetic", action="store_true",
                    help="use a synthetic dataset of comparable scale")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--tile-size", type=int, default=128)
    ap.add_argument("--profile-dir", default=None,
                    help="write a jax.profiler device trace here")
    ap.add_argument("--checkpoint-dir", default=None,
                    help="save/resume params+optimizer state here "
                         "(per-repeat subdirs when repeats > 1)")
    ap.add_argument("--checkpoint-every", type=int, default=None,
                    help="save cadence in epochs (default: 10)")
    ap.add_argument("--exe-cache-dir", default=None,
                    help="pin compiled train/predict executables here "
                         "(kills the minutes-long remote recompile AND "
                         "the compile-draw lottery on process restarts; "
                         "keyed by lowered-HLO hash)")
    ap.add_argument("--exe-search", type=int, default=0,
                    help="on a cache miss, compile N draws of the train "
                         "step and pin the fastest (XLA scheduling is "
                         "nondeterministic per compile; identical HLO "
                         "spreads ~2x at AM scale)")
    ap.add_argument("--distributed", action="store_true",
                    help="join a multi-process job (jax.distributed; "
                         "coordinator/process from JAX_COORDINATOR_ADDRESS/"
                         "JAX_PROCESS_ID/JAX_NUM_PROCESSES)")
    ap.add_argument("--mesh", type=int, default=None, metavar="N",
                    help="train sharded over an N-device 1-D edge mesh "
                         "(full-batch graph edge-partitioned; exact vs "
                         "single-device — tests/test_dist.py)")
    ap.add_argument("--backend", default="pallas",
                    choices=["pallas", "xla"],
                    help="per-shard kernel backend for --mesh runs")
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

    import dataclasses

    from rgcn_tpu.config import load_experiment, NodeClassificationExperiment
    from rgcn_tpu.train.node_classification import run_repeats
    from rgcn_tpu.utils.logging import ScalarLogger

    import os
    if not os.path.isfile(args.config):
        ap.error(f"config file not found: {args.config}")
    cfg = load_experiment(args.config)
    if not isinstance(cfg, NodeClassificationExperiment):
        ap.error(f"{args.config} is not a node-classification config")
    if args.epochs is not None:
        cfg = dataclasses.replace(
            cfg, training=dataclasses.replace(cfg.training, epochs=args.epochs)
        )
    if args.repeats is not None:
        cfg = dataclasses.replace(cfg, repeats=args.repeats)

    from rgcn_tpu.data.dispatch import load_nc_data

    data = load_nc_data(cfg, args.synthetic, data_root=args.data_root)

    logger = ScalarLogger(run_dir=args.run_dir, name="node_class")
    from rgcn_tpu.utils.profiling import trace

    if args.distributed or args.mesh:
        # multi-chip / multi-host path (rgcn_tpu.dist) — the reference is
        # strictly single-device (classify_nodes.py:46-47)
        from rgcn_tpu.dist.driver import train_node_classifier_sharded
        from rgcn_tpu.dist.mesh import make_mesh
        from rgcn_tpu.dist.multihost import initialize_distributed

        if args.distributed:
            initialize_distributed()
        mesh = make_mesh(args.mesh)
        import jax

        print(
            f"[mesh] {dict(mesh.shape)} over {len(jax.devices())} devices, "
            f"{getattr(jax, 'process_count', lambda: 1)()} process(es)"
        )
        with trace(args.profile_dir, enabled=args.profile_dir is not None):
            acc = train_node_classifier_sharded(
                cfg, data, mesh, logger=logger, tile_size=args.tile_size,
                backend=args.backend,
                checkpoint_dir=args.checkpoint_dir,
                checkpoint_every=args.checkpoint_every,
                exe_cache_dir=args.exe_cache_dir,
                exe_search=args.exe_search,
            )
            logger.log_scalar("test.accuracy", round(acc, 2))
        return

    with trace(args.profile_dir, enabled=args.profile_dir is not None):
        run_repeats(cfg, data, logger=logger, tile_size=args.tile_size,
                    checkpoint_dir=args.checkpoint_dir,
                    checkpoint_every=args.checkpoint_every,
                    exe_cache_dir=args.exe_cache_dir,
                    exe_search=args.exe_search)


if __name__ == "__main__":
    main()
