"""Trainer dispatch-path equivalence tests.

The LP trainer has three in-process execution paths for the same epoch
schedule (``train/link_prediction.py``):

* plain in-jit       — ``pallas_train_step=False`` (assembled batch,
                       XLA scorer)
* structured in-jit  — ``pallas_train_step=True, host_graph_build=False``
                       (layout-free structured decoder; the default on
                       tpu/axon backends)
* hosted structured  — ``host_graph_build=True`` (background host builds,
                       sorted scatter-free backward)

``negative_structure`` draws bit-identical negatives to ``corrupt_batch``
(tests/test_basis.py pins the op-level forward exactness), so toggling
paths keeps the sampling schedule and the final metrics must agree to
float reassociation. Round-3 ADVICE flagged that no automated test drove
the structured in-jit branch.
"""

import numpy as np

from rgcn_tpu.config import load_experiment
from rgcn_tpu.data.synthetic import synthetic_link_prediction
from rgcn_tpu.train.link_prediction import train_link_predictor
from rgcn_tpu.utils.logging import ScalarLogger


def _lp_cfg():
    return load_experiment(
        {
            "dataset": {"name": "synthetic"},
            "training": {
                "epochs": 4,
                "graph_batch_size": 32,
                "negative_sampling": {"sampling_rate": 3, "head_prob": 0.5},
                "optimiser": {"algorithm": "adam", "learn_rate": 0.01,
                              "weight_decay": 0.0},
            },
            "encoder": {
                "model": "rgcn", "num_layers": 1, "node_embedding": 8,
                "hidden1_size": 8,
                "edge_dropout": {"general": 0.3, "self_loop": 0.2,
                                 "self_loop_type": "schlichtkrull-dropout"},
                "weight_init": "schlichtkrull-normal",
            },
            # bias-free decoder + schlichtkrull L2: structured_decoder_ok
            "decoder": {"model": "distmult", "l2_penalty": 0.01,
                        "l2_penalty_type": "schlichtkrull-l2"},
            "evaluation": {"final_run": False, "filtered": True,
                           "check_every": 10, "batch_size": 16},
        }
    )


def test_injit_structured_matches_plain_batch_path():
    cfg = _lp_cfg()
    assert cfg.structured_decoder_ok(True)
    data = synthetic_link_prediction(num_nodes=40, num_rels=3, num_edges=200)
    quiet = ScalarLogger(verbose=False)

    mrr_plain, _, ranks_plain, _ = train_link_predictor(
        cfg, data, seed=2, logger=quiet, tile_size=8,
        pallas_train_step=False,
    )
    # the structured in-jit branch (default on tpu/axon; interpret-mode
    # Pallas encoder + layout-free structured decoder here on CPU)
    mrr_st, _, ranks_st, _ = train_link_predictor(
        cfg, data, seed=2, logger=quiet, tile_size=8,
        pallas_train_step=True, host_graph_build=False,
    )
    assert abs(mrr_plain - mrr_st) < 0.02, (mrr_plain, mrr_st)
    # same draws, same schedule: the overwhelming majority of test ranks
    # must agree exactly (paths differ only by float reassociation)
    agree = np.mean(np.asarray(ranks_plain) == np.asarray(ranks_st))
    assert agree > 0.9, agree


def test_injit_structured_matches_hosted_path():
    cfg = _lp_cfg()
    data = synthetic_link_prediction(num_nodes=40, num_rels=3, num_edges=200)
    quiet = ScalarLogger(verbose=False)

    mrr_st, _, ranks_st, _ = train_link_predictor(
        cfg, data, seed=2, logger=quiet, tile_size=8,
        pallas_train_step=True, host_graph_build=False,
    )
    mrr_hosted, _, ranks_hosted, _ = train_link_predictor(
        cfg, data, seed=2, logger=quiet, tile_size=8,
        pallas_train_step=True, host_graph_build=True,
    )
    # The hosted path's BACKWARD is a different (sorted, scatter-free)
    # program, so per-step float-reassociation drift compounds over epochs
    # and flips individual ranks in this tiny 40-candidate model — exact
    # rank agreement is not expected here (unlike the forward-identical
    # plain-vs-structured pair above). Metrics must stay equivalent.
    assert abs(mrr_st - mrr_hosted) < 0.02, (mrr_st, mrr_hosted)
    mean_rank_drift = np.mean(
        np.abs(np.asarray(ranks_st, float) - np.asarray(ranks_hosted, float))
    )
    assert mean_rank_drift < 3.0, mean_rank_drift
