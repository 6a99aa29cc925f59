#!/usr/bin/env python
"""Two-process CPU dryrun: prove the sharded LP training step runs
*multi-process* (the multi-host execution model), not just multi-device.

Each process contributes 4 virtual CPU devices; ``jax.distributed``
stitches them into one 8-device job; the 2-D (replica × edge) mesh places
the replica axis across processes — exactly how a 2-host TPU pod job lays
out (see :mod:`rgcn_tpu.dist.multihost`). The parent spawns both workers
and checks they agree on a finite loss.

Usage:  python benchmarks/multiprocess_dryrun.py            # parent
        (workers are spawned automatically)
"""

from __future__ import annotations

import os
import subprocess
import sys

PORT = int(os.environ.get("MP_DRYRUN_PORT", "7723"))
NPROC = 2
DEV_PER_PROC = 4


def worker(pid: int) -> None:
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


def main() -> int:
    if "--worker" in sys.argv:
        worker(int(sys.argv[sys.argv.index("--worker") + 1]))
        return 0

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker", str(i)],
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
    losses = []
    for i, out in enumerate(outs):
        for line in out.splitlines():
            if "sharded multi-process step OK" in line:
                losses.append(line.split("loss=")[1])
                print(line)
    if code == 0 and len(losses) == NPROC and len(set(losses)) == 1:
        print(f"multiprocess_dryrun: {NPROC} processes agreed, loss={losses[0]}")
        return 0
    print("multiprocess_dryrun FAILED")
    for i, out in enumerate(outs):
        print(f"--- worker {i} output ---")
        print(out[-3000:])
    return 1


if __name__ == "__main__":
    sys.exit(main())
