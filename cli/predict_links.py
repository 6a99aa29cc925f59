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
    ap.add_argument("--exe-cache-dir", default=None,
                    help="pin the compiled train step here (kills the "
                         "minutes-long remote recompile and compile-draw "
                         "lottery on restarts; HLO-hash keyed)")
    ap.add_argument("--exe-search", type=int, default=0,
                    help="on a cache miss, compile N draws of the train "
                         "step and pin the fastest")
    ap.add_argument("--distributed", action="store_true",
                    help="join a multi-process job (jax.distributed; "
                         "coordinator/process from JAX_COORDINATOR_ADDRESS/"
                         "JAX_NUM_PROCESSES/JAX_PROCESS_ID or pod metadata)")
    ap.add_argument("--mesh", default=None, metavar="RxE",
                    help="train sharded over a (replica x edge) device mesh,"
                         " e.g. 1x8 or 2x4; 'auto' = one replica per process")
    ap.add_argument("--virtual-devices", type=int, default=None,
                    help="force N virtual host devices (CPU validation of "
                         "the sharded path without TPU hardware)")
    args = ap.parse_args()

    if args.virtual_devices:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual_devices}"
        )
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

    if not os.path.isfile(args.config):
        ap.error(f"config file not found: {args.config}")
    cfg = load_experiment(args.config)
    if not isinstance(cfg, LinkPredictionExperiment):
        ap.error(f"{args.config} is not a link-prediction config")

    from rgcn_tpu.data.dispatch import load_lp_data

    data = load_lp_data(cfg, args.synthetic, data_root=args.data_root)

    logger = ScalarLogger(run_dir=args.run_dir, name="link_pred")
    from rgcn_tpu.utils.profiling import trace

    if args.distributed or args.mesh:
        # multi-chip / multi-host path: sharded driver over a 2-D mesh
        # (rgcn_tpu.dist) — the reference has no distribution story at all
        # (/root/reference/experiments/classify_nodes.py:46-47)
        from rgcn_tpu.dist.driver import train_link_predictor_sharded
        from rgcn_tpu.dist.multihost import (
            initialize_distributed,
            make_mesh_2d,
        )

        if args.distributed:
            initialize_distributed()
        if args.mesh and args.mesh != "auto":
            try:
                reps, edges = (int(v) for v in args.mesh.lower().split("x"))
            except ValueError:
                ap.error(f"--mesh must look like 2x4, got {args.mesh!r}")
            mesh = make_mesh_2d(num_replicas=reps, edge_size=edges)
        else:
            mesh = make_mesh_2d()
        import jax

        print(
            f"[mesh] {dict(mesh.shape)} over {len(jax.devices())} devices, "
            f"{getattr(jax, 'process_count', lambda: 1)()} process(es)"
        )
        with trace(args.profile_dir, enabled=args.profile_dir is not None):
            train_link_predictor_sharded(
                cfg, data, mesh, logger=logger, tile_size=args.tile_size,
                max_epochs=args.epochs,
                checkpoint_dir=args.checkpoint_dir,
                checkpoint_every=args.checkpoint_every,
                exe_cache_dir=args.exe_cache_dir,
                exe_search=args.exe_search,
            )
        return

    with trace(args.profile_dir, enabled=args.profile_dir is not None):
        train_link_predictor(
            cfg, data, logger=logger, tile_size=args.tile_size,
            max_epochs=args.epochs, checkpoint_dir=args.checkpoint_dir,
            checkpoint_every=args.checkpoint_every,
            exe_cache_dir=args.exe_cache_dir, exe_search=args.exe_search,
        )


if __name__ == "__main__":
    main()
