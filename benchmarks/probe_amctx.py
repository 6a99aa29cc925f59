#!/usr/bin/env python
"""What makes gathers 15-20x slower INSIDE the AM program? — context
bisection.

probe_gather6 measured the AM fan gather shape at 6.2 ns/row (9.2 ms)
standalone; probe_stress_nc measures the identical expression at
138-152 ms inside the AM step program (xp_fan_iso), with barriers and
width/fusion ruled out. The remaining context differences are bisected
here, one at a time, interleaved in ONE process:

  v0_base     exact gather6 narrow control (uniform random indices)
  v1_idx      v0 + the REAL edge_pair index vector (clustered, zipf
              duplicates, pad runs) instead of uniform
  v2_state    v0 + AM-sized pass-through state: a (40, 300k, 10) f32
              params leaf + two same-sized adam-state leaves returned
              (one perturbed) every step — the un-donated copy traffic
              the expr steps carry
  v3_both     v1 + v2
  v4_es       v3 + the full EdgeSet arrays as unused step arguments

    python benchmarks/probe_amctx.py [--rounds 4]
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
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--nodes", type=int, default=300_000)
    ap.add_argument("--rels", type=int, default=266)
    ap.add_argument("--edges", type=int, default=1_000_000)
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

    from rgcn_tpu.data.synthetic import synthetic_kg
    from rgcn_tpu.graph.structure import auto_nc_row_block, build_edge_set

    t0 = time.time()
    triples = synthetic_kg(args.nodes, args.rels, args.edges, seed=9,
                           reciprocity=0.0)
    es = build_edge_set(
        triples, args.nodes, args.rels, tile_size=512,
        with_dst_layout=True, with_pair_index=True,
        layout_row_block=auto_nc_row_block(args.nodes),
    )
    u_pad = es.pairs.pair_src.shape[0]
    e_pad = es.dst.shape[0]
    print(f"probe_amctx: U_pad={u_pad} E_pad={e_pad} "
          f"prep={time.time() - t0:.1f}s", flush=True)

    rng = np.random.default_rng(0)
    x_nar = jnp.asarray(rng.normal(size=(u_pad, 10)).astype(np.float32))
    idx_uniform = jnp.asarray(
        rng.integers(0, u_pad, e_pad).astype(np.int32)
    )
    idx_real = jnp.asarray(np.asarray(es.pairs.edge_pair))

    # AM-sized state: one params-class leaf + two adam-class leaves
    big = [
        jnp.asarray(rng.normal(size=(40, args.nodes, 10)).astype(np.float32))
        for _ in range(3)
    ]
    small = jnp.zeros((8,), jnp.float32)  # the perturbed leaf

    es_arrays = (es.src, es.dst, es.rel, es.val,
                 jnp.asarray(es.layout.perm))

    def gather_term(x, idx):
        t = x * jnp.float32(1.0000001)
        return jnp.sum(t[idx])

    progs = {}

    def reg(name, fn, args0):
        progs[name] = (jax.jit(fn), args0)

    reg("v0_base",
        lambda x, s: (x + gather_term(x, idx_uniform) * 1e-12, s),
        (x_nar, small))
    reg("v1_idx",
        lambda x, s: (x + gather_term(x, idx_real) * 1e-12, s),
        (x_nar, small))

    def with_state(idx):
        def fn(x, s, b0, b1, b2):
            loss = gather_term(x, idx)
            return x + loss * 1e-12, s + loss * 1e-12, b0, b1, b2

        return fn

    reg("v2_state", with_state(idx_uniform),
        (x_nar, small, *big))
    reg("v3_both", with_state(idx_real),
        (x_nar, small, *big))

    def v4(x, s, b0, b1, b2, *es_args):
        loss = gather_term(x, idx_real)
        return (x + loss * 1e-12, s + loss * 1e-12, b0, b1, b2)

    reg("v4_es", v4, (x_nar, small, *big, *es_arrays))

    # v5: the probe pieces' table PRODUCER — a barriered broadcast (every
    # row identical) instead of an input-derived table
    def v5(x, s):
        vec = x[0]
        table = jax.lax.optimization_barrier(
            jnp.broadcast_to(vec, (u_pad, 10))
        )
        loss = jnp.sum(table[idx_real])
        return x + loss * 1e-12, s + loss * 1e-12

    reg("v5_bcast", v5, (x_nar, small))

    # v6: indices as a jit ARGUMENT instead of a closure constant — the
    # one remaining structural difference from the in-program gathers
    # (EdgeSet arrays ride as arguments; every fast isolated probe so far
    # closed over its indices)
    def v6(x, s, idx):
        loss = gather_term(x, idx)
        return x + loss * 1e-12, s + loss * 1e-12, idx

    reg("v6_argidx", v6, (x_nar, small, idx_real))

    def v7(x, s, idx):
        loss = gather_term(x, idx)
        return x + loss * 1e-12, s + loss * 1e-12, idx

    reg("v7_argidx_uniform", v7, (x_nar, small, idx_uniform))

    states = {}
    for name, (fn, a0) in progs.items():
        t0 = time.time()
        out = fn(*a0)
        jax.block_until_ready(out)
        float(np.asarray(out[0]).reshape(-1)[0])
        states[name] = (out, a0)
        print(f"  [{name}] compile+first {time.time() - t0:.1f}s",
              flush=True)

    def run(name, k):
        (out, a0) = states[name]
        fn = progs[name][0]
        t0 = time.perf_counter()
        for _ in range(k):
            rest = a0[len(out):]
            out = fn(*out, *rest) if rest else fn(*out)
        float(np.asarray(out[0]).reshape(-1)[0])
        states[name] = (out, a0)
        return time.perf_counter() - t0

    best = {name: float("inf") for name in progs}
    for rnd in range(args.rounds):
        for name in progs:
            t_short = run(name, 1)
            t_long = run(name, 1 + args.iters)
            dt = (t_long - t_short) / args.iters
            best[name] = min(best[name], dt)
            print(f"  [round {rnd}] {name}: {dt * 1e3:.2f} ms "
                  f"(best {best[name] * 1e3:.2f})", flush=True)

    results = {k: round(v * 1e3, 2) for k, v in best.items()}
    if canary:
        from rgcn_tpu.utils.canary import measure_canary

        canary["after"] = measure_canary(tag="after")
    print(json.dumps({"what": "probe_amctx", "results": results,
                      **({"canary": canary} if canary else {})}),
          flush=True)


if __name__ == "__main__":
    main()
