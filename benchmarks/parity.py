#!/usr/bin/env python
"""Real-dataset parity harness: run every shipped config against its
dataset and diff the resulting metrics against BASELINE.md.

The container is zero-egress and ships no datasets, so this harness is
built to be *ready*: the moment the reference datasets exist under
``data/`` (or ``--data-root`` / ``$RGCN_TPU_DATA`` — same layout as the
reference's ``get_data.sh``), one command produces the full parity table:

    python benchmarks/parity.py                 # all 12 configs
    python benchmarks/parity.py --only WN18     # subset
    python benchmarks/parity.py --epochs 50     # quick look
    make parity

Configs whose dataset is absent are reported SKIPPED (no data) — never an
error. ``--fabricate`` generates miniature synthetic datasets in the
reference file formats into a temp root and runs the entire harness at 3
epochs — the CI proof that the harness executes end-to-end
(tests/test_parity_harness.py).

Baseline targets repeat BASELINE.md: external-paper values (approximate,
provenance-labeled there) — the point of this harness is to re-measure.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# (metric kind, target value, source note) per config, from BASELINE.md.
TARGETS = {
    "rgcn/nc-AIFB": ("accuracy_pct", 95.8, "arXiv:1703.06103"),
    "rgcn/nc-MUTAG": ("accuracy_pct", 73.2, "arXiv:1703.06103"),
    "rgcn/nc-BGS": ("accuracy_pct", 83.1, "arXiv:1703.06103"),
    "rgcn/nc-AM": ("accuracy_pct", 89.3, "arXiv:1703.06103"),
    "rgcn/lp-WN18": ("mrr_filtered", 0.81, "arXiv:1703.06103"),
    "rgcn/lp-FB-toy": ("mrr_filtered", None, "to be measured"),
    "e-rgcn/nc-AIFB": ("accuracy_pct", None, "arXiv:2107.10015"),
    "e-rgcn/nc-MUTAG": ("accuracy_pct", None, "arXiv:2107.10015"),
    "e-rgcn/nc-BGS": ("accuracy_pct", None, "arXiv:2107.10015"),
    "e-rgcn/nc-AM": ("accuracy_pct", None, "arXiv:2107.10015"),
    "c-rgcn/lp-WN18": ("mrr_filtered", None, "arXiv:2107.10015"),
    "c-rgcn/lp-FB-toy": ("mrr_filtered", None, "arXiv:2107.10015"),
}


def dataset_available(cfg, root: str) -> bool:
    from rgcn_tpu.data.loaders import _LP_REGISTRY, _NC_REGISTRY

    name = cfg.dataset.name.lower()
    if name in _NC_REGISTRY:
        graph_rel, train_rel, test_rel, _, _ = _NC_REGISTRY[name]
        return all(
            os.path.isfile(os.path.join(root, p))
            for p in (graph_rel, train_rel, test_rel)
        )
    if name in _LP_REGISTRY:
        d = os.path.join(root, _LP_REGISTRY[name])
        return all(
            os.path.isfile(os.path.join(d, f))
            for f in ("train.txt", "valid.txt", "test.txt")
        )
    return False


def run_config(cfg_path: str, root: str, epochs, repeats, final_run: bool,
               bwd_dtype: str = None):
    """Train one config; returns (metric_name, value, extras).

    ``bwd_dtype`` overrides ``decoder.bwd_dtype`` on LP configs — the
    knob for the narrow-backward metric-neutrality check (run the same
    config with and without it and compare the final MRR)."""
    import dataclasses

    from rgcn_tpu.config import (
        LinkPredictionExperiment,
        NodeClassificationExperiment,
        load_experiment,
    )
    from rgcn_tpu.utils.logging import ScalarLogger

    cfg = load_experiment(cfg_path)
    logger = ScalarLogger(verbose=False)  # quiet; final metrics only

    if isinstance(cfg, NodeClassificationExperiment):
        from rgcn_tpu.data.loaders import load_node_classification
        from rgcn_tpu.train.node_classification import run_repeats

        data = load_node_classification(
            cfg.dataset.name,
            final_run=final_run,
            prune=cfg.dataset.prune,
            data_root=root,
            enable_cache=False,
        )
        if epochs is not None:
            cfg = dataclasses.replace(
                cfg, training=dataclasses.replace(cfg.training, epochs=epochs)
            )
        if repeats is not None:
            cfg = dataclasses.replace(cfg, repeats=repeats)
        acc, ste = run_repeats(cfg, data, logger=logger)
        return "accuracy_pct", acc, {"ste": ste}

    assert isinstance(cfg, LinkPredictionExperiment)
    from rgcn_tpu.data.loaders import load_link_prediction
    from rgcn_tpu.train.link_prediction import train_link_predictor

    data = load_link_prediction(
        cfg.dataset.name, final_run=final_run, data_root=root
    )
    pallas_step = host_build = None
    if bwd_dtype is not None:
        cfg = dataclasses.replace(
            cfg, decoder=dataclasses.replace(cfg.decoder, bwd_dtype=bwd_dtype)
        )
        # bwd_dtype lives in the structured (Pallas, host-built-layouts)
        # decoder; off-TPU the trainer would default to the XLA in-jit
        # step and the knob would be a silent no-op — force the production
        # path (interpret-mode kernels on CPU) so the neutrality check
        # actually exercises it.
        pallas_step = host_build = True
    mrr, hits, _, _ = train_link_predictor(
        cfg, data, logger=logger, max_epochs=epochs,
        pallas_train_step=pallas_step, host_graph_build=host_build,
    )
    return "mrr_filtered", mrr, {
        "hits@1": hits[0], "hits@3": hits[1], "hits@10": hits[2]
    }


# ---------------------------------------------------------------------------
# Fabricated miniature datasets (reference file formats) for CI.
# ---------------------------------------------------------------------------

def fabricate_datasets(root: str, seed: int = 0) -> None:
    """Miniature datasets in the reference file formats — **learnable by
    construction**, so the harness can assert actual learning (metrics
    above chance) rather than mere completion:

    * NC: every entity carries a ``memberOf`` edge to its class's indicator
      node — messages flow object→subject, so one R-GCN layer separates the
      classes perfectly; held-out accuracy must clear chance (1/3).
    * LP: one relation is a within-group clique over 4 entity groups (plus
      random noise relations); DistMult separates groups in embedding
      space, so filtered test MRR must clear the random-ranking baseline
      (``H_N / N`` ≈ 0.078 at N=60).
    """
    import numpy as np

    from rgcn_tpu.data.loaders import _LP_REGISTRY, _NC_REGISTRY

    rng = np.random.default_rng(seed)

    for name, (graph_rel, train_rel, test_rel, label_h, node_h) in (
        _NC_REGISTRY.items()
    ):
        d = os.path.join(root, name)
        os.makedirs(d, exist_ok=True)
        n_ent, n_lab, n_cls = 40, 36, 3  # 24 train / 12 test — 8.3% steps
        ents = [f"http://ex/{name}/e{i}" for i in range(n_ent)]
        inds = [f"http://ex/{name}/class_indicator{c}" for c in range(n_cls)]
        lines = []
        for i in range(n_ent):  # class-revealing structure
            lines.append(
                f"<{ents[i]}> <http://ex/memberOf> <{inds[i % n_cls]}> ."
            )
        # a few noise edges for realism — kept sparse so the featureless
        # (one-hot) configs generalize from structure instead of
        # memorizing node identities through per-node weight rows
        for i in range(n_ent // 2):
            s, o = rng.integers(0, n_ent, 2)
            p = rng.integers(0, 4)
            lines.append(f"<{ents[s]}> <http://ex/rel{p}> <{ents[o]}> .")
        with gzip.open(os.path.join(root, graph_rel), "wt") as f:
            f.write("\n".join(lines) + "\n")

        def tsv(path, rows):
            with open(path, "w") as f:
                f.write(f"{node_h}\t{label_h}\n")
                for e, l in rows:
                    f.write(f"{e}\t{l}\n")

        labeled = [(ents[i], f"class{i % n_cls}") for i in range(n_lab)]
        tsv(os.path.join(root, train_rel), labeled[: n_lab - 12])
        tsv(os.path.join(root, test_rel), labeled[n_lab - 12:])

    for name, sub in _LP_REGISTRY.items():
        d = os.path.join(root, sub)
        os.makedirs(d, exist_ok=True)
        n_ent, n_noise_rel, n_grp = 60, 4, 4
        # all ordered within-group pairs under the clique relation /r/0
        pairs = [
            (s, o)
            for s in range(n_ent)
            for o in range(n_ent)
            if s != o and s % n_grp == o % n_grp
        ]
        rng.shuffle(pairs)
        clique = [f"/e/{s}\t/r/0\t/e/{o}" for s, o in pairs]
        noise = [
            f"/e/{rng.integers(0, n_ent)}\t/r/{1 + rng.integers(0, n_noise_rel)}"
            f"\t/e/{rng.integers(0, n_ent)}"
            for _ in range(80)
        ]
        splits = (
            ("train.txt", clique[:300] + noise),
            ("valid.txt", clique[300:340]),
            ("test.txt", clique[340:380]),
        )
        for fname, rows in splits:
            with open(os.path.join(d, fname), "w") as f:
                f.write("\n".join(rows) + "\n")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--epochs", type=int, default=None,
                    help="override config epochs (default: full config)")
    ap.add_argument("--repeats", type=int, default=None,
                    help="override NC repeat count")
    ap.add_argument("--only", default=None, help="substring filter on config")
    ap.add_argument("--validation", action="store_true",
                    help="validation split instead of the final test split")
    ap.add_argument("--fabricate", action="store_true",
                    help="generate mini datasets in a temp root and run at "
                         "3 epochs (harness self-test)")
    ap.add_argument("--bwd-dtype", default=None,
                    help="override decoder.bwd_dtype on LP configs (e.g. "
                         "bfloat16) — the narrow-backward neutrality check")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from rgcn_tpu.data.loaders import DATA_ROOT
    from rgcn_tpu.config import load_experiment

    root = args.data_root or DATA_ROOT
    epochs, repeats = args.epochs, args.repeats
    if args.fabricate:
        import tempfile

        root = tempfile.mkdtemp(prefix="rgcn_parity_fab_")
        fabricate_datasets(root)
        epochs = epochs or 80
        repeats = repeats or 1

    # Learning floors for the fabricated (learnable-by-construction)
    # datasets: chance is 33.3% accuracy / ~0.078 random-ranking MRR at
    # N=60. A silent training regression cannot hide behind "it ran".
    fab_floor = (
        {"accuracy_pct": 50.0, "mrr_filtered": 0.15} if args.fabricate else {}
    )

    rows = []
    for key, (metric, target, source) in TARGETS.items():
        cfg_path = os.path.join(REPO, "configs", key + ".yaml")
        if args.only and args.only.lower() not in key.lower():
            continue
        cfg = load_experiment(cfg_path)
        if not dataset_available(cfg, root):
            rows.append({"config": key, "status": "SKIPPED (no data)",
                         "metric": metric, "target": target})
            continue
        t0 = time.time()
        try:
            mname, value, extras = run_config(
                cfg_path, root, epochs, repeats,
                final_run=not args.validation,
                bwd_dtype=args.bwd_dtype,
            )
            row = {"config": key, "status": "OK", "metric": mname,
                   "value": round(float(value), 4), "target": target,
                   "wall_s": round(time.time() - t0, 1), **extras}
            if target is not None:
                row["delta"] = round(float(value) - target, 4)
            floor = fab_floor.get(mname)
            # `not (x >= floor)`, not `x < floor`: a NaN metric (diverged
            # run) must fail the floor, not silently pass it
            if floor is not None and not (float(value) >= floor):
                row["status"] = (
                    f"ERROR: no learning — {mname} {float(value):.4f} "
                    f"< floor {floor} on a learnable fabricated dataset"
                )
            rows.append(row)
        except Exception as e:  # noqa: BLE001 — report per-config failures
            rows.append({"config": key, "status": f"ERROR: {e!r}"[:160],
                         "metric": metric, "target": target})

    width = max(len(r["config"]) for r in rows) if rows else 10
    print(f"\n{'config':<{width}}  {'metric':<14} {'value':>8} {'target':>8} "
          f"{'delta':>8}  status")
    for r in rows:
        val = r.get("value", "")
        tgt = r.get("target")
        delta = r.get("delta", "")
        print(f"{r['config']:<{width}}  {r['metric']:<14} "
              f"{val if val != '' else '-':>8} "
              f"{tgt if tgt is not None else '-':>8} "
              f"{delta if delta != '' else '-':>8}  {r['status']}")

    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(rows, f, indent=1)

    n_err = sum(r["status"].startswith("ERROR") for r in rows)
    return 1 if n_err else 0


if __name__ == "__main__":
    sys.exit(main())
