#!/usr/bin/env python
"""Row-gather cost vs (row count, table size): does the 3.5 ns/row law hold
at AM scale?

Motivation (round 9): every XLA row gather inside the AM-scale NC program
measures ~115-175 ns/row (fan-out 1.5M narrow rows: 171 ms; layout perm
1.65M narrow rows: ~220 ms; fused/unfused 1.65M wide rows: ~290 ms),
while the WN18-scale laws on file say 3.5 ns/row (33 MB tables, 367k
rows) and ~15 ns/row (240 MB tables, 382k rows — probe_gather5), and the
0.92 ms pinned canary op (137k fused rows) reproduces in the SAME
sessions. Width and input-fusion measured irrelevant at AM scale
(probe_stress_nc xp_fan/xp_fan128, xp_fusedw/xp_unfusedw). The remaining
axes are ROW COUNT and TABLE SIZE — this probe sweeps the grid with
interleaved chains so one congestion burst cannot fake a trend.

    python benchmarks/probe_gather6.py [--rounds 4]
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
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--no-canary", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        from rgcn_tpu.utils.compile_cache import enable

        enable()

    canary = {}
    if not args.cpu and not args.no_canary:
        from rgcn_tpu.utils.canary import measure_canary

        canary["before"] = measure_canary(tag="before")

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    d = 400  # bf16 -> 800-B rows, the AM wide-table row shape
    tables = {
        "33MB": 41_000,
        "240MB": 300_000,
    }
    row_counts = [137_000, 400_000, 800_000, 1_600_000]

    # one f32 input per table size; the bf16 gather table is COMPUTED from
    # it (cast producer) so the gather source is a computed table like the
    # AM program's (barriers nowhere: the cast is the producer)
    xs = {
        tag: jnp.asarray(rng.normal(size=(t, d)).astype(np.float32))
        for tag, t in tables.items()
    }
    perms = {
        (tag, L): jnp.asarray(
            rng.integers(0, tables[tag], L).astype(np.int32)
        )
        for tag in tables
        for L in row_counts
    }
    # narrow control: the AM fan shape — (590k, 10) f32 table, 1.5M rows
    x_nar = jnp.asarray(rng.normal(size=(590_000, 10)).astype(np.float32))
    perm_nar = jnp.asarray(rng.integers(0, 590_000, 1_500_000).astype(np.int32))

    progs = {}
    for tag in tables:
        for L in row_counts:
            perm = perms[(tag, L)]
            T = tables[tag]

            def fn(x, perm=perm, T=T):
                t = (x * jnp.float32(1.0000001)).astype(jnp.bfloat16)
                y = t[perm]
                # consume EVERY gathered row (a partial slice would let
                # XLA shrink the gather); one extra (L, d) reduce pass,
                # uniform across variants, small vs the signal
                return x + jnp.sum(y.astype(jnp.float32), axis=0) * 1e-9

            progs[f"{tag}_r{L // 1000}k"] = (jax.jit(fn), xs[tag], L)

    def fn_nar(x):
        t = x * jnp.float32(1.0000001)
        y = t[perm_nar]
        return x + jnp.sum(y, axis=0) * 1e-9

    progs["narrow24MB_r1500k"] = (jax.jit(fn_nar), x_nar, 1_500_000)

    def sync(y):
        float(y.reshape(-1)[0])

    # compile all up front
    states = {}
    for name, (fn, x0, L) in progs.items():
        t0 = time.time()
        y = fn(x0)
        sync(y)
        states[name] = y
        print(f"  [{name}] compile+first {time.time() - t0:.1f}s",
              flush=True)

    def run(name, k):
        fn, x0, L = progs[name]
        y = states[name]
        t0 = time.perf_counter()
        for _ in range(k):
            y = fn(y)
        sync(y)
        states[name] = y
        return time.perf_counter() - t0

    best = {name: float("inf") for name in progs}
    for rnd in range(args.rounds):
        for name in progs:
            L = progs[name][2]
            iters = max(4, min(64, 8_000_000 // L))
            t_short = run(name, 1)
            t_long = run(name, 1 + iters)
            dt = (t_long - t_short) / iters
            best[name] = min(best[name], dt)
            print(
                f"  [round {rnd}] {name}: {dt * 1e3:.2f} ms "
                f"({dt / L * 1e9:.2f} ns/row; best "
                f"{best[name] / L * 1e9:.2f})",
                flush=True,
            )

    results = {
        name: {
            "ms": round(best[name] * 1e3, 3),
            "ns_per_row": round(best[name] / progs[name][2] * 1e9, 3),
        }
        for name in progs
    }
    if canary:
        from rgcn_tpu.utils.canary import measure_canary

        canary["after"] = measure_canary(tag="after")
    print(json.dumps({"what": "probe_gather6", "results": results,
                      **({"canary": canary} if canary else {})}),
          flush=True)


if __name__ == "__main__":
    main()
