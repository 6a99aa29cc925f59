"""Whole-model link-prediction parity against the reference.

The reference LP stack is unrunnable as shipped (live ``exit()`` at
``models.py:132``, broken Schlichtkrull init calls, triple duplication with
inconsistent normalization). These tests neutralize those defects in memory
— no-op ``exit``, glorot-normal init (avoids the broken call path), clean
self-loop generation — execute the reference models end-to-end, and assert
score/penalty parity with copied weights. This extends the layer-level LP
parity to the full encoder→DistMult pipeline, including c-RGCN (executable
in the reference only when ``node_embedding == hidden1_size``, the one
configuration where its encoder-width inconsistency cancels out).
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

if "/root/reference" not in sys.path:
    sys.path.append("/root/reference")

import warnings

with warnings.catch_warnings():
    warnings.simplefilter("ignore")
    import torch_rgcn.layers as ref_layers
    import torch_rgcn.models as ref_models

import jax.numpy as jnp  # noqa: E402

from rgcn_tpu.graph.structure import build_edge_set  # noqa: E402
from rgcn_tpu.models import (  # noqa: E402
    CompressionRelationPredictor,
    LinkPredictor,
)
from tests.conftest import make_random_triples  # noqa: E402


@pytest.fixture
def neutralized_reference(monkeypatch):
    def only_self_loops(triples, num_nodes, num_rels, keep_prob, device="cpu"):
        v = torch.arange(num_nodes, dtype=torch.long)[:, None]
        p = torch.full((num_nodes, 1), 2 * num_rels, dtype=torch.long)
        loops = torch.cat([v, p, v], dim=1)
        keep = torch.bernoulli(
            torch.full((num_nodes,), float(keep_prob))
        ).bool()
        return loops[keep]

    monkeypatch.setattr(ref_layers, "generate_self_loops", only_self_loops)
    import builtins

    monkeypatch.setattr(builtins, "exit", lambda *a, **k: None)
    yield


ENC = {
    "node_embedding": 8,
    "hidden1_size": 8,
    "num_layers": 1,
    "edge_dropout": {"general": 0.0, "self_loop": 0.0,
                     "self_loop_type": "none"},
    "weight_init": "glorot-normal",
    "include_gain": False,
    "bias_init": "zeros",
}
DEC = {
    "l2_penalty_type": "schlichtkrull-l2",
    "l2_penalty": 0.01,
    "weight_init": "standard-normal",
    "include_gain": False,
}


def _graph_and_batch(seed, n, r):
    rng = np.random.default_rng(seed)
    graph = make_random_triples(rng, n, r, 60)
    batch = np.stack(
        [rng.integers(0, n, 12), rng.integers(0, r, 12), rng.integers(0, n, 12)],
        axis=1,
    )
    return graph, batch


def test_link_predictor_model_parity(neutralized_reference):
    torch.manual_seed(1)
    n, r = 14, 3
    ref = ref_models.LinkPredictor(
        nnodes=n, nrel=r, encoder_config=ENC, decoder_config=DEC
    )
    ref.eval()
    graph, batch = _graph_and_batch(90, n, r)
    with torch.no_grad():
        want_scores, want_pen = ref(
            torch.tensor(graph, dtype=torch.long),
            torch.tensor(batch, dtype=torch.long),
        )

    model = LinkPredictor(
        num_nodes=n, num_relations=r, emb_dim=8, hidden1_size=8,
        num_layers=1, weight_init="glorot-normal", bias_init="zeros",
        decoder_l2_type="schlichtkrull-l2", decoder_l2=0.01,
    )
    params = {
        "params": {
            "node_embeddings": jnp.asarray(ref.node_embeddings.detach().numpy()),
            "node_embeddings_bias": jnp.asarray(
                ref.node_embeddings_bias.detach().numpy()
            ),
            "rgc1": {
                "weights": jnp.asarray(ref.rgc1.weights.detach().numpy()),
                "bias": jnp.asarray(ref.rgc1.bias.detach().numpy()),
            },
            "scoring_function": {
                "relations": jnp.asarray(
                    ref.scoring_function.relations.detach().numpy()
                ),
            },
        }
    }
    es = build_edge_set(graph, n, r, tile_size=8)
    scores, pen = model.apply(params, es, jnp.asarray(batch))
    np.testing.assert_allclose(
        np.asarray(scores), want_scores.numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        float(pen), float(want_pen), rtol=1e-4
    )


def test_compression_predictor_model_parity(neutralized_reference):
    torch.manual_seed(2)
    n, r = 14, 3
    # nemb == nhid1 is the configuration where the reference c-RGCN's
    # encoder-width inconsistency (models.py:217-219) cancels out and it
    # actually runs; parity is asserted there.
    ref = ref_models.CompressionRelationPredictor(
        nnodes=n, nrel=r, encoder_config=ENC, decoder_config=DEC
    )
    ref.eval()
    graph, batch = _graph_and_batch(91, n, r)
    with torch.no_grad():
        want_scores, want_pen = ref(
            torch.tensor(graph, dtype=torch.long),
            torch.tensor(batch, dtype=torch.long),
        )

    model = CompressionRelationPredictor(
        num_nodes=n, num_relations=r, emb_dim=8, hidden1_size=8,
        num_layers=1, weight_init="glorot-normal", bias_init="zeros",
        decoder_l2_type="schlichtkrull-l2", decoder_l2=0.01,
    )
    params = {
        "params": {
            "node_embeddings": jnp.asarray(ref.node_embeddings.detach().numpy()),
            "node_embeddings_bias": jnp.asarray(
                ref.node_embeddings_bias.detach().numpy()
            ),
            "encoding_layer": {
                "kernel": jnp.asarray(
                    ref.encoding_layer.weight.detach().numpy().T
                ),
                "bias": jnp.asarray(ref.encoding_layer.bias.detach().numpy()),
            },
            "decoding_layer": {
                "kernel": jnp.asarray(
                    ref.decoding_layer.weight.detach().numpy().T
                ),
                "bias": jnp.asarray(ref.decoding_layer.bias.detach().numpy()),
            },
            "rgc1": {
                "weights": jnp.asarray(ref.rgc1.weights.detach().numpy()),
                "bias": jnp.asarray(ref.rgc1.bias.detach().numpy()),
            },
            "scoring_function": {
                "relations": jnp.asarray(
                    ref.scoring_function.relations.detach().numpy()
                ),
            },
        }
    }
    es = build_edge_set(graph, n, r, tile_size=8)
    scores, pen = model.apply(params, es, jnp.asarray(batch))
    np.testing.assert_allclose(
        np.asarray(scores), want_scores.numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(float(pen), float(want_pen), rtol=1e-4)
