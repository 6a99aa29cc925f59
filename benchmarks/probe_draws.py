#!/usr/bin/env python
"""Compile-draw spread probe: compile the SAME merged basis op several
times in one process (distinct jit wrappers around an identical body force
fresh XLA compiles) and chain-time each executable. Quantifies how much an
in-bench draw search can recover from compile nondeterminism
(STATUS.md: 0.51-0.88 ms across processes for one op).

    python benchmarks/probe_draws.py [--draws 4] [--iters 100] \
        [--variant m256|d2c256]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--draws", type=int, default=4)
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--variant", default="m256")
    args = ap.parse_args()

    from rgcn_tpu.utils.compile_cache import enable

    enable()

    import jax
    import jax.numpy as jnp

    from bench import _chained_time, build_workload
    from rgcn_tpu.graph.coalesce import build_merged_layout
    from rgcn_tpu.graph.structure import build_edge_set
    from rgcn_tpu.ops.pallas_basis import rel_spmm_basis_merged_ad

    triples, num_nodes, num_rels, dim = build_workload(False, reciprocity=0.9)
    es = build_edge_set(triples, num_nodes, num_rels, tile_size=512,
                        with_dst_layout=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(num_nodes, dim)).astype(np.float32))
    w_self = jnp.asarray(rng.normal(size=(dim, dim)).astype(np.float32))
    nb = 2
    rng_b = np.random.default_rng(1)
    bases = jnp.asarray(rng_b.normal(size=(nb, dim, dim)).astype(np.float32))
    comps = jnp.asarray(
        rng_b.normal(size=(2 * num_rels, nb)).astype(np.float32)
    )
    edges_aug = es.num_edges + num_nodes

    if args.variant.startswith("m"):
        ch, k = int(args.variant[1:]), 0
    else:
        kpart, cpart = args.variant[1:].split("c")
        k, ch = int(kpart), int(cpart)
    merged = build_merged_layout(
        np.asarray(es.dst), np.asarray(es.src), np.asarray(es.rel),
        np.asarray(es.val), num_nodes, es.num_rels,
        row_block=128, chunk=ch, dedup_k=k,
    )
    md = jax.tree.map(jnp.asarray, merged)

    times = []
    for draw in range(args.draws):
        # identical body; a fresh function identity forces a fresh compile
        def op(x, wv, _draw=draw):
            w_arr, m = wv
            return rel_spmm_basis_merged_ad(
                m, x, bases, comps, compute_dtype=jnp.bfloat16
            ) + x @ w_arr.astype(jnp.bfloat16)

        t0 = time.time()
        dt = _chained_time(op, x, (w_self, md), args.iters, passes=2)
        times.append(dt)
        print(
            f"draw {draw}: {dt * 1e3:.3f} ms/op "
            f"({edges_aug / dt / 1e6:.0f}M edges/s) "
            f"wall incl compile {time.time() - t0:.0f}s",
            flush=True,
        )

    best = min(times)
    print(
        f"spread: {min(times) * 1e3:.3f}-{max(times) * 1e3:.3f} ms; "
        f"best {edges_aug / best / 1e6:.0f}M edges/s"
    )


if __name__ == "__main__":
    main()
