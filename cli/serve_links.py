#!/usr/bin/env python
"""Link-prediction serving endpoint (checkpoint -> query answering).

Companion to ``cli/predict_links.py``: train with ``--checkpoint-dir``,
then serve the checkpoint:

    python cli/serve_links.py --config configs/rgcn/lp-WN18.yaml \
        --checkpoint-dir /tmp/ck --queries queries.tsv --topk 10

``--queries`` is a TSV of either ``s p o`` triples (point scores) or
``s p ?`` / ``? p o`` rows (top-k tail / head ranking); entity and
relation columns accept names (resolved through the dataset vocabulary)
or integer ids. Without ``--queries`` the server answers tail queries
for the first test triples as a smoke demonstration. The reference has
no serving path at all — its closest analogue re-encodes the graph per
evaluation batch (``/root/reference/utils/misc.py:60-110``).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _resolve(tok: str, vocab, column: str = "entity"):
    if tok in vocab:
        return vocab[tok]
    try:
        return int(tok)
    except ValueError:
        raise SystemExit(
            f"error: {column} token {tok!r} is not in the dataset vocabulary "
            f"and is not an integer id"
        )


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True)
    ap.add_argument("--checkpoint-dir", required=True)
    ap.add_argument("--queries", default=None, help="TSV query file")
    ap.add_argument("--topk", type=int, default=10)
    ap.add_argument(
        "--filtered", action="store_true",
        help="mask known-true training edges out of top-k rankings "
             "(KG-completion mode)",
    )
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tile-size", type=int, default=128)
    ap.add_argument("--max-batch", type=int, default=1024)
    ap.add_argument(
        "--exe-cache-dir", default=None,
        help="directory for pinned compiled executables (HLO-hash keyed; "
             "a server restart then skips every XLA compile). Defaults to "
             "<checkpoint-dir>/.exe_cache on TPU backends; pass '' to "
             "disable.",
    )
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        from rgcn_tpu.utils.compile_cache import enable as _enable_cache

        _enable_cache()

    import numpy as np

    from rgcn_tpu.config import LinkPredictionExperiment, load_experiment
    from rgcn_tpu.serve import load_lp_server

    if not os.path.isfile(args.config):
        ap.error(f"config file not found: {args.config}")
    cfg = load_experiment(args.config)
    if not isinstance(cfg, LinkPredictionExperiment):
        ap.error(f"{args.config} is not a link-prediction config")

    from rgcn_tpu.data.dispatch import load_lp_data

    data = load_lp_data(cfg, args.synthetic, data_root=args.data_root)

    exe_cache_dir = args.exe_cache_dir
    if exe_cache_dir is None and not args.cpu:
        exe_cache_dir = os.path.join(args.checkpoint_dir, ".exe_cache")
    elif exe_cache_dir == "":
        exe_cache_dir = None

    import time as _time

    t0 = _time.time()
    srv = load_lp_server(
        cfg, data, args.checkpoint_dir, tile_size=args.tile_size,
        max_batch=args.max_batch, exe_cache_dir=exe_cache_dir,
    )
    if srv is None:
        ap.error(f"no checkpoint found under {args.checkpoint_dir}")
    print(
        f"[serve] encoded {srv.num_nodes} nodes in {_time.time() - t0:.1f}s "
        f"(cold start incl. compile-or-load); top-k={args.topk}"
    )

    i2n = data.i2n

    def show_rank(tag, q, scores, ents):
        names = [i2n[e] if e < len(i2n) else str(e) for e in ents]
        print(f"{tag} {q}: " + ", ".join(
            f"{n}:{s:.3f}" for n, s in zip(names, scores)
        ))

    if args.queries:
        triples, tails, heads = [], [], []
        with open(args.queries) as f:
            rows = [ln.split() for ln in f if ln.strip()]
        for row in rows:
            if len(row) != 3:
                ap.error(f"bad query row (need 3 columns): {row}")
            s, p, o = row
            if s == "?":
                heads.append((_resolve(p, data.r2i, "relation"),
                              _resolve(o, data.n2i, "entity")))
            elif o == "?":
                tails.append((_resolve(s, data.n2i, "entity"),
                              _resolve(p, data.r2i, "relation")))
            else:
                triples.append(
                    (_resolve(s, data.n2i, "entity"),
                     _resolve(p, data.r2i, "relation"),
                     _resolve(o, data.n2i, "entity"))
                )
        if triples:
            scores = srv.score(np.asarray(triples))
            for t, sc in zip(triples, scores):
                print(f"score {t}: {sc:.4f}")
        if tails:
            sc, en = srv.topk_tails(
                np.asarray(tails), k=args.topk, filtered=args.filtered
            )
            for q, s_row, e_row in zip(tails, sc, en):
                show_rank("tails", q, s_row, e_row)
        if heads:
            sc, en = srv.topk_heads(
                np.asarray(heads), k=args.topk, filtered=args.filtered
            )
            for q, s_row, e_row in zip(heads, sc, en):
                show_rank("heads", q, s_row, e_row)
        return

    # no query file: demonstrate on the first test triples
    test = np.asarray(data.test)[:8]
    sc, en = srv.topk_tails(test[:, :2], k=args.topk, filtered=args.filtered)
    for q, s_row, e_row in zip(test[:, :2], sc, en):
        show_rank("tails", tuple(q), s_row, e_row)


if __name__ == "__main__":
    main()
