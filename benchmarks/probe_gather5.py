#!/usr/bin/env python
"""Gather-source asymmetry at decoder-backward scale: permutation gathers
of (L, d) rows from a COMPUTED table vs from a PROGRAM INPUT, f32 vs bf16.

Motivated by benchmarks/probe_lp_bwd.py: the corrupted-side aggregation
(permute 382k computed rows + kernel) costs 8.6 ms while an input-table
300k-row gather costs 0.78 ms.

    python benchmarks/probe_gather5.py [--iters 60]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=60)
    args = ap.parse_args()

    from rgcn_tpu.utils.compile_cache import enable

    enable()

    import jax
    import jax.numpy as jnp

    T, L, d = 300_000, 382_000, 200
    rng = np.random.default_rng(0)
    x32 = jnp.asarray(rng.normal(size=(T, d)).astype(np.float32))
    perm = jnp.asarray(rng.integers(0, T, L).astype(np.int32))

    def chain(fn, x0, iters=args.iters):
        jitted = jax.jit(fn)

        def sync(y):
            float(y.reshape(-1)[0])

        def measure(kk):
            y = jitted(x0)
            sync(y)
            ts = []
            for _ in range(3):
                y = x0
                t0 = time.perf_counter()
                for _ in range(kk):
                    y = jitted(y)
                sync(y)
                ts.append(time.perf_counter() - t0)
            return min(ts)

        return (measure(2 + iters) - measure(2)) / iters

    results = {}

    # (a) gather from the jit INPUT buffer
    def g_input(x):
        y = x[perm]
        return x + y[:T] * 1e-9

    results["input_f32_ms"] = chain(g_input, x32) * 1e3

    # (b) gather from a COMPUTED table (one cheap elementwise producer)
    def g_computed(x):
        t = x * jnp.float32(1.0000001) + jnp.float32(1e-7)
        y = t[perm]
        return x + y[:T] * 1e-9

    results["computed_f32_ms"] = chain(g_computed, x32) * 1e3

    # (c) computed + CONCAT producer (the _rows_to_nodes shape)
    def g_concat(x):
        t = jnp.concatenate([x, jnp.zeros((1, d), x.dtype)], axis=0)
        y = t[perm]
        return x + y[:T] * 1e-9

    results["concat_f32_ms"] = chain(g_concat, x32) * 1e3

    # (d) computed table in bf16 (halved row bytes)
    def g_computed_bf16(x):
        t = (x * jnp.float32(1.0000001)).astype(jnp.bfloat16)
        y = t[perm]
        return x + y[:T].astype(x.dtype) * 1e-9

    results["computed_bf16_ms"] = chain(g_computed_bf16, x32) * 1e3

    # (e) two stacked input-table gathers + elementwise (the proposed
    # nodes[ent]*rel[p] row rebuild shape) — rel table tiny, reuse x rows
    perm2 = jnp.asarray(rng.integers(0, T, L).astype(np.int32))

    def g_two(x):
        y = x[perm] * x[perm2]
        return x + y[:T] * 1e-9

    results["two_input_f32_ms"] = chain(g_two, x32) * 1e3

    for k_, v in results.items():
        results[k_] = round(v, 3)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
