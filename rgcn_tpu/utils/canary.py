"""Tunnel-health canary: a pinned known-floor executable measured before
and after every stress campaign.

Every stress-scale conclusion in this repo used to be conditioned on a
"believed-quiet tunnel" judged by eye — same-code AM steps measured
513-1455 ms across hours, and BASELINE.md repeatedly disclaims cross-day
comparability. This module turns that belief into a number: ONE small
known-floor program (the bench winner class — the WN18-scale coalesced
basis op, long-chain truth 0.82-0.93 ms across compile draws) is compiled
once, pinned to a repo-level cache, and re-measured with long chains at
campaign boundaries. Because the pinned executable is byte-identical
across processes and days, its measured time moves ONLY with backend
health (congestion, tunnel RPC, chip share) — never with compile draws or
code changes — so:

* a campaign run under ``canary ratio <= 1.2`` is comparable to any other
  run under the same gate (cross-day BASELINE rows become comparable);
* a campaign with a high ratio is flagged (and should be re-run), instead
  of silently recording congestion as a regression.

The floor is a ratchet: a sidecar JSON records the minimum long-chain ms
ever observed for the pinned executable and only ever decreases, so the
ratio is always measured against the best the backend has shown for THIS
byte-exact program.

Usage (probes integrate this automatically; see ``benchmarks/canary.py``
for the CLI)::

    from rgcn_tpu.utils.canary import measure_canary
    c = measure_canary()          # {'ms', 'floor_ms', 'ratio', 'healthy'}
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Optional

__all__ = ["measure_canary", "default_cache_dir", "HEALTHY_RATIO"]

# ratio above which a campaign should be flagged/refused: the pinned bench
# winner re-measured 0.921-0.930 ms across days on quiet tunnels (r03/r04
# logs) vs its 0.817 ms floor — ~1.14x is normal chip-day spread, so the
# gate sits just above it. Congested days measured the same class 2-10x.
HEALTHY_RATIO = 1.25

_DIM = 200
_NB = 2


def default_cache_dir() -> str:
    root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    return os.path.join(root, ".canary_exe_cache")


def _build_workload():
    """The bench real-size workload (fixed seeds): WN18-scale coalesced
    basis op inputs. See bench.py::build_workload — sizes give 141,375
    post-dedup base triples matching real WN18's 141,442."""
    import jax.numpy as jnp
    import numpy as np

    from rgcn_tpu.data.synthetic import synthetic_kg
    from rgcn_tpu.graph.coalesce import build_merged_layout
    from rgcn_tpu.graph.structure import build_edge_set

    num_nodes, num_rels, num_edges = 40_943, 18, 187_000
    triples = synthetic_kg(
        num_nodes, num_rels, num_edges, seed=0, reciprocity=0.9
    )
    es = build_edge_set(triples, num_nodes, num_rels, tile_size=512)
    merged = build_merged_layout(
        np.asarray(es.dst), np.asarray(es.src), np.asarray(es.rel),
        np.asarray(es.val), num_nodes, es.num_rels,
        row_block=128, chunk=256, dedup_k=2,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.normal(size=(num_nodes, _DIM)).astype(np.float32)
    )
    w_self = jnp.asarray(
        rng.normal(size=(_DIM, _DIM)).astype(np.float32)
    )
    rng_b = np.random.default_rng(1)
    bases = jnp.asarray(
        rng_b.normal(size=(_NB, _DIM, _DIM)).astype(np.float32)
    )
    comps = jnp.asarray(
        rng_b.normal(size=(2 * num_rels, _NB)).astype(np.float32)
    )
    import jax

    m_dev = jax.tree.map(jnp.asarray, merged)
    return es, x, (w_self, bases, comps, m_dev)


def _make_step():
    """The chained canary step (bench.py::_make_step shape: full data
    dependency between calls, bounded magnitude)."""
    import jax
    import jax.numpy as jnp

    from rgcn_tpu.ops.pallas_basis import rel_spmm_basis_merged_ad

    def step(x, pack):
        w_self, bases, comps, m = pack
        out = rel_spmm_basis_merged_ad(
            m, x, bases, comps, compute_dtype=jnp.bfloat16
        ) + x @ w_self.astype(jnp.bfloat16)
        return x + out.astype(x.dtype) * jnp.asarray(1e-9, x.dtype)

    return jax.jit(step)


def _measure_step(step, x, pack, iters, reps=3, passes=2):
    """Chained-diff ms/op — bench.py::_measure_step methodology (the
    tunneled backend acks dispatch before execution; difference two chain
    lengths to cancel the fetch RPC; min over reps/passes)."""

    def measure(k):
        y = step(x, pack)
        float(y[0, 0])
        ts = []
        for _ in range(reps):
            y = x
            t0 = time.perf_counter()
            for _ in range(k):
                y = step(y, pack)
            float(y[0, 0])
            ts.append(time.perf_counter() - t0)
        return min(ts)

    k0, k1 = 2, 2 + iters
    estimates = [(measure(k1) - measure(k0)) / iters for _ in range(passes)]
    positive = [e for e in estimates if e > 0]
    return (min(positive) if positive else min(estimates)) * 1e3


def _floor_path(cache_dir: str) -> str:
    return os.path.join(cache_dir, "canary_floor.json")


def _read_floor(cache_dir: str, key: str) -> Optional[float]:
    try:
        with open(_floor_path(cache_dir)) as f:
            d = json.load(f)
        return float(d["floor_ms"]) if d.get("key") == key else None
    except Exception:  # noqa: BLE001
        return None


def _write_floor(cache_dir: str, key: str, floor_ms: float) -> None:
    try:
        os.makedirs(cache_dir, exist_ok=True)
        tmp = _floor_path(cache_dir) + f".tmp{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump({"key": key, "floor_ms": round(floor_ms, 4)}, f)
        os.replace(tmp, _floor_path(cache_dir))
    except Exception as e:  # noqa: BLE001
        print(f"canary: floor write failed ({e})", file=sys.stderr)


def measure_canary(
    cache_dir: Optional[str] = None,
    iters: int = 100,
    passes: int = 2,
    tag: str = "",
    verbose: bool = True,
) -> dict:
    """Measure the pinned canary executable; returns
    ``{'ms', 'floor_ms', 'ratio', 'healthy', 'pinned'}``.

    First-ever use compiles one draw and pins it (the floor then ratchets
    down across later measurements); every later use loads the byte-exact
    pinned program, so the measured ms moves only with backend health.
    Never raises: any failure returns ``{'ms': None, ...}`` with a stderr
    note so campaigns proceed (unflagged) rather than die.
    """
    try:
        from rgcn_tpu.utils import exe_cache

        cache_dir = cache_dir or default_cache_dir()
        es, x, pack = _build_workload()
        key = exe_cache.workload_key(
            metric="canary-basis-merged", n=x.shape[0], e=int(es.num_edges),
            d=_DIM, v=1,
        )
        pinned = True
        hit = exe_cache.load_executable(cache_dir, key)
        if hit is not None:
            step = hit[0]
        else:
            pinned = False
            step = _make_step().lower(x, pack).compile()
            exe_cache.save_executable(
                cache_dir, key, step, {"tag": "canary"}
            )
        ms = _measure_step(step, x, pack, iters, passes=passes)
        floor = _read_floor(cache_dir, key)
        if ms > 0 and (floor is None or ms < floor):
            _write_floor(cache_dir, key, ms)
            floor = ms if floor is None else min(floor, ms)
        ratio = (ms / floor) if (floor and ms > 0) else None
        healthy = ratio is not None and ratio <= HEALTHY_RATIO
        out = {
            "ms": round(ms, 3),
            "floor_ms": round(floor, 3) if floor else None,
            "ratio": round(ratio, 3) if ratio is not None else None,
            "healthy": healthy,
            "pinned": pinned,
        }
        if verbose:
            state = "QUIET" if healthy else "CONGESTED/UNKNOWN"
            print(
                f"canary{f'[{tag}]' if tag else ''}: {out['ms']} ms "
                f"(floor {out['floor_ms']}, ratio {out['ratio']}) "
                f"-> tunnel {state}",
                file=sys.stderr, flush=True,
            )
        return out
    except Exception as e:  # noqa: BLE001 — campaigns must not die on it
        print(f"canary: measurement failed ({type(e).__name__}: {e})",
              file=sys.stderr)
        return {"ms": None, "floor_ms": None, "ratio": None,
                "healthy": None, "pinned": False}
