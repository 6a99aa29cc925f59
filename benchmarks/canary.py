#!/usr/bin/env python
"""CLI for the tunnel-health canary (rgcn_tpu/utils/canary.py).

Prints one JSON line: the pinned known-floor executable's long-chain ms,
the ratcheted floor, and the health verdict. Run before/after (or during)
any stress campaign; probes embed the same measurement automatically.

    python benchmarks/canary.py            # measure once (TPU)
    python benchmarks/canary.py --iters 60 # shorter chain
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--cache-dir", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        from rgcn_tpu.utils.compile_cache import enable

        enable()

    from rgcn_tpu.utils.canary import measure_canary

    out = measure_canary(
        cache_dir=args.cache_dir, iters=args.iters, passes=args.passes
    )
    print(json.dumps({"what": "canary", **out}), flush=True)


if __name__ == "__main__":
    main()
