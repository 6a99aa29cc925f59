"""Node-classification models: R-GCN and e-RGCN.

Reference: ``/root/reference/torch_rgcn/models.py:137-200`` (``NodeClassifier``)
and ``:248-296`` (``EmbeddingNodeClassifier``). Both consume a static
:class:`~rgcn_tpu.graph.structure.EdgeSet` built once at preprocessing time —
the reference instead re-stacks and re-normalizes its sparse adjacency on
every forward (``torch_rgcn/layers.py:255-279``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from rgcn_tpu.graph.structure import EdgeSet
from rgcn_tpu.nn import init as rinit
from rgcn_tpu.nn.layers import RGCNConv

__all__ = ["NodeClassifier", "EmbeddingNodeClassifier"]


class NodeClassifier(nn.Module):
    """Featureless 1–2 layer R-GCN returning logits for all nodes.

    Layer 1 is featureless (one-hot identity input), layer 2 featureful —
    the reference's horizontal/vertical stacking split
    (``models.py:170-190``) is purely an implementation artifact of its
    sparse layout and collapses to the same math here.
    """

    num_nodes: int
    num_relations: int  # original relation count R
    num_classes: int
    hidden_size: int = 16
    num_layers: int = 2
    decomposition: Optional[str] = None
    num_bases: int = 0
    num_blocks: int = 0
    axis_name: Optional[str] = None
    backend: str = "auto"  # forwarded to RGCNConv (see RGCNConv.backend)

    def setup(self):
        if not 0 < self.num_layers < 3:
            raise ValueError("only 1 or 2 RGCN layers are supported")
        r_aug = 2 * self.num_relations + 1
        nhid = self.num_classes if self.num_layers == 1 else self.hidden_size
        self.rgc1 = RGCNConv(
            num_nodes=self.num_nodes,
            num_relations=r_aug,
            in_features=None,
            out_features=nhid,
            decomposition=self.decomposition,
            num_bases=self.num_bases,
            num_blocks=self.num_blocks,
            weight_init="glorot-uniform",
            weight_gain=True,
            bias_init="zeros",
            axis_name=self.axis_name,
            backend=self.backend,
        )
        if self.num_layers == 2:
            self.rgc2 = RGCNConv(
                num_nodes=self.num_nodes,
                num_relations=r_aug,
                in_features=nhid,
                out_features=self.num_classes,
                decomposition=self.decomposition,
                num_bases=self.num_bases,
                num_blocks=self.num_blocks,
                weight_init="glorot-uniform",
                weight_gain=True,
                bias_init="zeros",
                axis_name=self.axis_name,
                backend=self.backend,
            )

    def __call__(self, edges: EdgeSet) -> jax.Array:
        x = self.rgc1(edges)
        if self.num_layers == 2:
            x = nn.relu(x)
            x = self.rgc2(edges, x)
        return x

    def layer1_l2(self, params) -> jax.Array:
        """Sum-of-squares of first-layer weights, decomposition-aware.

        Mirrors the penalty assembled by the experiment runner
        (``experiments/classify_nodes.py:111-118``).
        """
        p1 = params["params"]["rgc1"]
        if self.decomposition == "basis":
            return jnp.sum(p1["bases"] ** 2) + jnp.sum(p1["comps"] ** 2)
        if self.decomposition == "block":
            return jnp.sum(p1["blocks"] ** 2)
        return jnp.sum(p1["weights"] ** 2)


class EmbeddingNodeClassifier(nn.Module):
    """e-RGCN: learned node embeddings + a diagonal-weight first layer.

    Reference ``models.py:248-296``: embeddings ``(N, nemb)`` with
    kaiming-normal(fan_in) init, a ``diag_weight_matrix`` R-GCN layer at
    width ``nemb``, ReLU, then a standard R-GCN layer to class logits.
    """

    num_nodes: int
    num_relations: int
    num_classes: int
    emb_dim: int = 32
    decomposition: Optional[str] = None
    num_bases: int = 0
    num_blocks: int = 0
    axis_name: Optional[str] = None
    backend: str = "auto"  # forwarded to RGCNConv (see RGCNConv.backend)

    def setup(self):
        r_aug = 2 * self.num_relations + 1
        self.node_embeddings = self.param(
            "node_embeddings",
            rinit.kaiming_normal_fan_in(),
            (self.num_nodes, self.emb_dim),
            jnp.float32,
        )
        self.rgcn_no_hidden = RGCNConv(
            num_nodes=self.num_nodes,
            num_relations=r_aug,
            in_features=self.emb_dim,
            out_features=self.emb_dim,
            diag=True,
            weight_init="glorot-uniform",
            weight_gain=True,
            axis_name=self.axis_name,
            backend=self.backend,
        )
        self.rgc1 = RGCNConv(
            num_nodes=self.num_nodes,
            num_relations=r_aug,
            in_features=self.emb_dim,
            out_features=self.num_classes,
            decomposition=self.decomposition,
            num_bases=self.num_bases,
            num_blocks=self.num_blocks,
            weight_init="glorot-uniform",
            weight_gain=True,
            bias_init="zeros",
            axis_name=self.axis_name,
            backend=self.backend,
        )

    def __call__(self, edges: EdgeSet) -> jax.Array:
        x = self.rgcn_no_hidden(edges, self.node_embeddings)
        x = nn.relu(x)
        return self.rgc1(edges, x)

    def embedding_l2(self, params) -> jax.Array:
        """Sum-of-squares of node embeddings
        (``experiments/classify_nodes.py:121-124``)."""
        return jnp.sum(params["params"]["node_embeddings"] ** 2)
