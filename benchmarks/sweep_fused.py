#!/usr/bin/env python
"""Sweep fused-kernel layout parameters (row_block, chunk, quantum) on the
WN18-scale workload (see bench.py for the workload definition and the
async-chain timing methodology).

Cost model being explored: per-slot message FLOPs scale with ``din``; per-slot
one-hot aggregation FLOPs scale with ``row_block``; total slots ``L`` grow as
``row_block`` shrinks (more (row_block, rel) runs → more quantum padding).
Minimize ``L * (din + row_block)``.

Writes one JSON line per config to stdout (redirect to a file; run under
``timeout`` in the background — remote compiles are minutes-slow).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    sys.path.insert(0, "/root/repo")
    from rgcn_tpu.utils.compile_cache import enable as _enable_cache

    _enable_cache()

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from bench import _chained_time, build_workload
    from rgcn_tpu.graph.structure import build_edge_set
    from rgcn_tpu.ops.pallas_fused import build_fused_layout, rel_spmm_fused

    quick = "--quick" in sys.argv
    triples, num_nodes, num_rels, dim = build_workload(quick)
    es = build_edge_set(triples, num_nodes, num_rels, tile_size=512)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(num_nodes, dim)).astype(np.float32))
    w = jnp.asarray(
        rng.normal(size=(2 * num_rels + 1, dim, dim)).astype(np.float32)
    )
    edges_aug = es.num_edges + num_nodes

    import ast
    import os

    env_cfg = os.environ.get("SWEEP_CONFIGS")
    if env_cfg:
        configs = ast.literal_eval(env_cfg)
    else:
        configs = [
            (512, 512, 16),  # round-1 optimum (baseline)
            (256, 512, 16),
            (256, 256, 16),
            (256, 256, 8),
            (128, 512, 16),
            (128, 256, 16),
            (128, 256, 8),
            (128, 128, 8),
            (64, 256, 8),
        ]
    iters = 4 if quick else 20

    for rb, ch, q in configs:
        t_build = time.time()
        fl = build_fused_layout(es, row_block=rb, chunk=ch, quantum=q)
        t_build = time.time() - t_build
        L = int(fl.src.shape[0])

        def op(x, w, fl=fl):
            return (
                rel_spmm_fused(fl, num_nodes, x, w[:-1],
                               compute_dtype=jnp.bfloat16)
                + x @ w[-1].astype(jnp.bfloat16)
            )

        try:
            t0 = time.time()
            dt = _chained_time(op, x, w, iters)
            wall = time.time() - t0
        except Exception as e:  # noqa: BLE001 - report and continue sweep
            print(json.dumps({"rb": rb, "ch": ch, "q": q, "L": L,
                              "error": repr(e)[:200]}), flush=True)
            continue
        print(
            json.dumps(
                {
                    "rb": rb, "ch": ch, "q": q, "L": L,
                    "ms_per_op": round(dt * 1e3, 3),
                    "edges_per_s": round(edges_aug / dt, 1),
                    "layout_build_s": round(t_build, 2),
                    "wall_s": round(wall, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
