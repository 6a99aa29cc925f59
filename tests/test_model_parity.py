"""Whole-model forward parity against the reference NodeClassifier /
EmbeddingNodeClassifier (the reference's NC stack is runnable, unlike LP).

Weights are copied from the initialized reference modules into our parameter
trees; logits must agree elementwise over the full node set.
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
    from torch_rgcn.models import (  # noqa: E402
        EmbeddingNodeClassifier as RefENC,
        NodeClassifier as RefNC,
    )

import jax.numpy as jnp  # noqa: E402

from rgcn_tpu.graph.structure import build_edge_set  # noqa: E402
from rgcn_tpu.models import (  # noqa: E402
    EmbeddingNodeClassifier,
    NodeClassifier,
)
from tests.conftest import make_random_triples  # noqa: E402


def test_node_classifier_parity_basis():
    rng = np.random.default_rng(30)
    n, r, c, h = 20, 4, 3, 8
    triples = make_random_triples(rng, n, r, 60)

    ref = RefNC(
        triples=triples.tolist(), nnodes=n, nrel=r, nclass=c, nhid=h,
        nlayers=2, decomposition={"type": "basis", "num_bases": 2},
    )
    ref.eval()
    with torch.no_grad():
        want = ref().numpy()

    es = build_edge_set(triples, n, r, tile_size=8)
    model = NodeClassifier(
        num_nodes=n, num_relations=r, num_classes=c, hidden_size=h,
        decomposition="basis", num_bases=2,
    )
    params = {
        "params": {
            "rgc1": {
                "bases": jnp.asarray(ref.rgc1.bases.detach().numpy()),
                "comps": jnp.asarray(ref.rgc1.comps.detach().numpy()),
                "bias": jnp.asarray(ref.rgc1.bias.detach().numpy()),
            },
            "rgc2": {
                "bases": jnp.asarray(ref.rgc2.bases.detach().numpy()),
                "comps": jnp.asarray(ref.rgc2.comps.detach().numpy()),
                "bias": jnp.asarray(ref.rgc2.bias.detach().numpy()),
            },
        }
    }
    got = np.asarray(model.apply(params, es))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_node_classifier_parity_plain_single_layer():
    rng = np.random.default_rng(31)
    n, r, c = 15, 3, 4
    triples = make_random_triples(rng, n, r, 40)

    ref = RefNC(triples=triples.tolist(), nnodes=n, nrel=r, nclass=c, nlayers=1)
    ref.eval()
    with torch.no_grad():
        want = ref().numpy()

    es = build_edge_set(triples, n, r, tile_size=8)
    model = NodeClassifier(
        num_nodes=n, num_relations=r, num_classes=c, num_layers=1,
    )
    params = {
        "params": {
            "rgc1": {
                "weights": jnp.asarray(ref.rgc1.weights.detach().numpy()),
                "bias": jnp.asarray(ref.rgc1.bias.detach().numpy()),
            }
        }
    }
    got = np.asarray(model.apply(params, es))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_embedding_node_classifier_parity():
    rng = np.random.default_rng(32)
    n, r, c, emb = 18, 3, 3, 6
    triples = make_random_triples(rng, n, r, 50)

    ref = RefENC(
        triples=triples.tolist(), nnodes=n, nrel=r, nclass=c, nemb=emb,
        nlayers=2,
    )
    ref.eval()
    with torch.no_grad():
        want = ref().numpy()

    es = build_edge_set(triples, n, r, tile_size=8)
    model = EmbeddingNodeClassifier(
        num_nodes=n, num_relations=r, num_classes=c, emb_dim=emb,
    )
    params = {
        "params": {
            "node_embeddings": jnp.asarray(
                ref.node_embeddings.detach().numpy()
            ),
            "rgcn_no_hidden": {
                "weights": jnp.asarray(
                    ref.rgcn_no_hidden.weights.detach().numpy()
                ),
            },
            "rgc1": {
                "weights": jnp.asarray(ref.rgc1.weights.detach().numpy()),
                "bias": jnp.asarray(ref.rgc1.bias.detach().numpy()),
            },
        }
    }
    got = np.asarray(model.apply(params, es))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
