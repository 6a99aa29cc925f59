"""All 12 shipped configs parse into the right experiment types with the
reference's hyperparameters intact."""

import glob
import os

from rgcn_tpu.config import (
    LinkPredictionExperiment,
    NodeClassificationExperiment,
    load_experiment,
)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_all_configs_parse():
    paths = sorted(glob.glob(os.path.join(ROOT, "configs", "**", "*.yaml")))
    assert len(paths) == 12
    for p in paths:
        cfg = load_experiment(p)
        name = os.path.basename(p)
        if name.startswith("nc-"):
            assert isinstance(cfg, NodeClassificationExperiment), p
        else:
            assert isinstance(cfg, LinkPredictionExperiment), p


def test_reference_hyperparameters():
    wn18 = load_experiment(os.path.join(ROOT, "configs/rgcn/lp-WN18.yaml"))
    assert wn18.training.epochs == 7000
    assert wn18.training.graph_batch_size == 30000
    assert wn18.training.sampling_method == "edge-neighborhood"
    assert wn18.encoder.decomposition.type == "basis"
    assert wn18.encoder.decomposition.num_bases == 2
    assert wn18.encoder.node_embedding == 200
    assert wn18.encoder.edge_dropout.general == 0.5
    assert wn18.encoder.edge_dropout.self_loop_type == "schlichtkrull-dropout"
    assert wn18.decoder.l2_penalty == 0.01
    assert wn18.evaluation.filtered is True

    fbtoy = load_experiment(os.path.join(ROOT, "configs/rgcn/lp-FB-toy.yaml"))
    assert fbtoy.encoder.decomposition.type == "block"
    assert fbtoy.encoder.decomposition.num_blocks == 100
    assert fbtoy.encoder.hidden1_size == 500

    am = load_experiment(os.path.join(ROOT, "configs/rgcn/nc-AM.yaml"))
    assert am.dataset.prune is True
    assert am.rgcn.hidden_size == 10
    assert am.rgcn.decomposition.num_bases == 40
    assert am.rgcn.layer1_l2_penalty == 0.0005

    ergcn = load_experiment(os.path.join(ROOT, "configs/e-rgcn/nc-AIFB.yaml"))
    assert ergcn.rgcn.model == "e-rgcn"
    assert ergcn.rgcn.node_embeddings == 32
    assert ergcn.training.optimiser.weight_decay == 0.005

    crgcn = load_experiment(os.path.join(ROOT, "configs/c-rgcn/lp-WN18.yaml"))
    assert crgcn.encoder.model == "c-rgcn"
    assert crgcn.encoder.node_embedding == 128
    assert crgcn.encoder.hidden1_size == 16
    assert crgcn.evaluation.final_run is False
