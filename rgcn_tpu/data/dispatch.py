"""Shared CLI dataset dispatch: real loaders with synthetic fallbacks.

Every entry point (train and serve, NC and LP) resolves its dataset the
same way — real files under ``data/`` through :mod:`rgcn_tpu.data.loaders`,
or a scale-matched synthetic substitute when ``--synthetic`` is passed
(this container has no network egress and ships no datasets). Keeping the
dispatch in ONE place guarantees a serve CLI loads exactly the data its
training CLI used.
"""

from __future__ import annotations

from typing import Optional

__all__ = ["load_lp_data", "load_nc_data"]


def load_lp_data(cfg, synthetic: bool, data_root: Optional[str] = None,
                 verbose: bool = True):
    """Link-prediction dataset for ``cfg`` (LinkPredictionExperiment)."""
    if synthetic:
        from rgcn_tpu.data.synthetic import (
            fb_toy_like,
            synthetic_link_prediction,
            wn18_like,
        )

        name = cfg.dataset.name.lower()
        if name == "wn18":
            data = wn18_like()
        elif name == "fb-toy":
            data = fb_toy_like()
        else:
            data = synthetic_link_prediction(seed=0)
        if verbose:
            print(
                f"[synthetic] {cfg.dataset.name}-like graph: "
                f"N={data.num_nodes} R={data.num_relations} "
                f"E={len(data.train)}"
            )
        return data

    from rgcn_tpu.data.loaders import load_link_prediction

    return load_link_prediction(
        cfg.dataset.name,
        final_run=cfg.evaluation.final_run,
        data_root=data_root,
    )


def load_nc_data(cfg, synthetic: bool, data_root: Optional[str] = None,
                 verbose: bool = True):
    """Node-classification dataset for ``cfg``
    (NodeClassificationExperiment)."""
    if synthetic:
        from rgcn_tpu.data.synthetic import (
            aifb_like,
            synthetic_node_classification,
        )

        if cfg.dataset.name.lower() == "aifb":
            data = aifb_like()
        else:
            data = synthetic_node_classification(seed=0)
        if verbose:
            print(
                f"[synthetic] {cfg.dataset.name}-like graph: "
                f"N={data.num_nodes} R={data.num_relations} "
                f"E={len(data.triples)}"
            )
        return data

    from rgcn_tpu.data.loaders import load_node_classification

    return load_node_classification(
        cfg.dataset.name,
        final_run=cfg.evaluation.final_run,
        prune=cfg.dataset.prune,
        data_root=data_root,
    )
