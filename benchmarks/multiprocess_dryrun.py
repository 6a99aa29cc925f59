#!/usr/bin/env python
"""Two-process CPU dryrun: prove the sharded LP training step runs
*multi-process* (the multi-host execution model), not just multi-device.

Each process contributes 4 virtual CPU devices; ``jax.distributed``
stitches them into one 8-device job; the 2-D (replica × edge) mesh places
the replica axis across processes — exactly how a 2-host TPU pod job lays
out (see :mod:`rgcn_tpu.dist.multihost`). The parent spawns both workers
and checks they agree on a finite loss.

``--full`` runs the COMPLETE multi-host training driver instead of a single
step: :func:`rgcn_tpu.dist.driver.train_link_predictor_sharded` — host
epoch pipeline, hosted Pallas-layout sharded steps, and the sharded
filtered evaluation — for several epochs across both processes, asserting
every process reports identical losses and final MRR.

``--pin`` proves PER-PROCESS executable pinning for multi-host runs: the
full driver runs TWICE with a shared ``exe_cache_dir`` — the first job
compiles and each process serializes its own executables (keyed by HLO +
process index + local device assignment, re-bound by global device id at
load); the second job must warm-start (``pinned executable hit`` for the
sharded step in every process) and reproduce the first job's losses and
MRR bit-for-bit.

Usage:  python benchmarks/multiprocess_dryrun.py [--full | --pin]  # parent
        (workers are spawned automatically)
"""

from __future__ import annotations

import os
import subprocess
import sys

PORT = int(os.environ.get("MP_DRYRUN_PORT", "7723"))
NPROC = 2
DEV_PER_PROC = 4


def worker(pid: int, full: bool = False) -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={DEV_PER_PROC}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{PORT}",
        num_processes=NPROC,
        process_id=pid,
    )
    assert jax.process_count() == NPROC
    assert len(jax.devices()) == NPROC * DEV_PER_PROC

    if full:
        return full_driver_worker(
            pid, pin_dir=os.environ.get("MP_DRYRUN_PIN_DIR") or None
        )

    import numpy as np
    import jax.numpy as jnp

    from rgcn_tpu.dist.mesh import EDGE_AXIS
    from rgcn_tpu.dist.multihost import REPLICA_AXIS, make_mesh_2d
    from rgcn_tpu.dist.train import make_sharded_lp_step
    from rgcn_tpu.graph.dynamic import build_edge_set_dynamic
    from rgcn_tpu.models import LinkPredictor
    from rgcn_tpu.train.optim import make_optimizer

    mesh = make_mesh_2d()  # replica = process axis, edge = local devices
    assert mesh.shape == {REPLICA_AXIS: NPROC, EDGE_AXIS: DEV_PER_PROC}

    num_nodes, num_rels, bsz, tile = 64, 4, 32, 8
    model_kwargs = dict(
        num_nodes=num_nodes, num_relations=num_rels,
        emb_dim=8, hidden1_size=8, num_layers=1,
        decomposition="basis", num_bases=2,
        weight_init="schlichtkrull-normal", bias_init="zeros",
        decoder_l2_type="schlichtkrull-l2", decoder_l2=0.01,
    )
    model = LinkPredictor(
        axis_name=EDGE_AXIS,
        decoder_axis_name=(REPLICA_AXIS, EDGE_AXIS),
        **model_kwargs,
    )
    init_model = LinkPredictor(**model_kwargs)

    rng = np.random.default_rng(0)  # same on both processes
    positives = jnp.asarray(
        np.stack(
            [
                rng.integers(0, num_nodes, bsz),
                rng.integers(0, num_rels, bsz),
                rng.integers(0, num_nodes, bsz),
            ],
            axis=1,
        )
    )
    edges0 = build_edge_set_dynamic(positives, num_nodes, num_rels, tile_size=tile)
    params = init_model.init({"params": jax.random.key(0)}, edges0, positives)
    tx = make_optimizer("adam", 0.01)
    opt_state = tx.init(params)

    step = make_sharded_lp_step(
        model, tx, mesh,
        num_nodes=num_nodes, num_rels=num_rels, tile_size=tile,
        num_negatives=2, head_prob=0.5, decoder_l2_weight=0.01,
    )
    params, opt_state, loss = step(params, opt_state, positives, jax.random.key(2))
    loss = float(loss)  # fully-replicated scalar: readable on every process
    assert np.isfinite(loss), loss
    print(f"[proc {pid}] sharded multi-process step OK, loss={loss:.6f}", flush=True)


def full_driver_worker(pid: int, pin_dir: str | None = None) -> None:
    """The COMPLETE multi-host training driver on a 2-process 2-D mesh:
    every process runs the identical program (same seeds), the replica axis
    spans the processes, and losses/eval metrics come back replicated.
    ``pin_dir`` additionally pins every process's executables (the --pin
    warm-start proof)."""
    import dataclasses

    import numpy as np

    from rgcn_tpu.config import load_experiment
    from rgcn_tpu.data.synthetic import synthetic_link_prediction
    from rgcn_tpu.dist.driver import train_link_predictor_sharded
    from rgcn_tpu.dist.multihost import REPLICA_AXIS, make_mesh_2d
    from rgcn_tpu.utils.logging import ScalarLogger

    mesh = make_mesh_2d()  # replica = process axis, edge = local devices
    assert mesh.shape[REPLICA_AXIS] == NPROC

    cfg = load_experiment("configs/rgcn/lp-FB-toy.yaml")
    cfg = dataclasses.replace(
        cfg,
        training=dataclasses.replace(cfg.training, graph_batch_size=128),
        evaluation=dataclasses.replace(cfg.evaluation, batch_size=16),
    )
    data = synthetic_link_prediction(
        num_nodes=120, num_rels=5, num_edges=600, seed=0
    )

    class Collect(ScalarLogger):
        def __init__(self):
            super().__init__(verbose=False)
            self.losses = []

        def log_scalar(self, name, value, step=None):
            super().log_scalar(name, value, step=step)
            if name == "training.loss":
                self.losses.append(value)

    logger = Collect()
    mrr, hits, ranks, params = train_link_predictor_sharded(
        cfg, data, mesh, logger=logger, max_epochs=3, tile_size=16,
        exe_cache_dir=pin_dir,
    )
    assert np.isfinite(mrr) and len(ranks) == 2 * len(data.test)
    losses = ",".join(f"{l:.6f}" for l in logger.losses)
    print(
        f"[proc {pid}] full multi-process driver OK, "
        f"losses=[{losses}] mrr={mrr:.6f}",
        flush=True,
    )


def _run_job(full: bool) -> tuple[int, list[str]]:
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker", str(i)]
            + (["--full"] if full else []),
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for i in range(NPROC)
    ]
    outs = []
    code = 0
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            code = 1
        outs.append(out)
        if p.returncode != 0:
            code = 1
    return code, outs


def _marker_lines(outs, marker):
    found = []
    for out in outs:
        for line in out.splitlines():
            if marker in line:
                # everything after the marker (losses=... / loss=...) must
                # agree bit-for-bit across processes
                found.append(line.split(marker)[1])
                print(line)
    return found


def _fail(outs) -> int:
    print("multiprocess_dryrun FAILED")
    for i, out in enumerate(outs):
        print(f"--- worker {i} output ---")
        print(out[-3000:])
    return 1


def main() -> int:
    full = "--full" in sys.argv
    pin = "--pin" in sys.argv
    if "--worker" in sys.argv:
        worker(int(sys.argv[sys.argv.index("--worker") + 1]),
               full=full or pin)
        return 0

    if pin:
        # per-process executable pinning proof: two cold+warm jobs over a
        # shared cache dir; the warm job must hit the pinned sharded step
        # in EVERY process and reproduce the cold job's metrics exactly
        import tempfile

        marker = "full multi-process driver OK"
        with tempfile.TemporaryDirectory() as d:
            os.environ["MP_DRYRUN_PIN_DIR"] = d
            results = []
            for phase in ("cold", "warm"):
                code, outs = _run_job(full=True)
                lines = _marker_lines(outs, marker)
                if code != 0 or len(lines) != NPROC or len(set(lines)) != 1:
                    return _fail(outs)
                results.append(lines[0])
                hits = sum(
                    "pinned executable hit for sharded_lp_step" in out
                    for out in outs
                )
                pins = len(os.listdir(d))
                print(f"[{phase}] step-pin hits {hits}/{NPROC} processes, "
                      f"{pins} cache entries")
                if phase == "cold" and pins == 0:
                    print("multiprocess_dryrun --pin: nothing serialized")
                    return _fail(outs)
                if phase == "warm" and hits != NPROC:
                    print("multiprocess_dryrun --pin: warm job did not hit "
                          "the pinned step in every process")
                    return _fail(outs)
            if results[0] != results[1]:
                print("multiprocess_dryrun --pin: warm metrics diverge "
                      f"from cold: {results[0]} vs {results[1]}")
                return 1
            print(f"multiprocess_dryrun --pin: warm-start reproduced the "
                  f"cold job bit-for-bit across {NPROC} processes:"
                  f"{results[0]}")
            return 0

    code, outs = _run_job(full)
    marker = (
        "full multi-process driver OK" if full
        else "sharded multi-process step OK"
    )
    losses = _marker_lines(outs, marker)
    if code == 0 and len(losses) == NPROC and len(set(losses)) == 1:
        print(f"multiprocess_dryrun: {NPROC} processes agreed:{losses[0]}")
        return 0
    return _fail(outs)


if __name__ == "__main__":
    sys.exit(main())
