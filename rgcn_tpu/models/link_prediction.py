"""Link-prediction models: R-GCN encoder + DistMult decoder, and c-RGCN.

Reference: ``/root/reference/torch_rgcn/models.py:14-134`` (``LinkPredictor``)
and ``:208-245`` (``CompressionRelationPredictor``).

The reference LP stack is unrunnable as shipped (live ``exit()`` at
``models.py:132``, a ``TypeError`` in its Schlichtkrull init calls, and a
shape mismatch in the c-RGCN encoder width); this implementation follows the
documented *intent* (companion paper arXiv:2107.10015):

* ``LinkPredictor``: learned embeddings ``(N, nemb)`` + broadcast bias row →
  ReLU → 1–2 R-GCN layers over ``2R + 1`` relations → DistMult scores, plus
  a decoder L2 penalty.
* ``CompressionRelationPredictor``: bottleneck ``Linear(nemb → nhid)`` before
  the R-GCN (which runs at width ``nhid``), ``Linear(nhid → nemb)`` after,
  with residual ``z = embeddings + decode(x)`` (``models.py:230-241``).

Both expose ``encode`` separately from ``__call__`` so evaluation can embed
the graph **once** and sweep all candidates densely — the reference re-ran
the full encoder for every evaluation batch (``utils/misc.py:86``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from rgcn_tpu.graph.structure import EdgeSet
from rgcn_tpu.nn import init as rinit
from rgcn_tpu.nn.layers import DistMult, RGCNConv, TorchLinear

__all__ = ["LinkPredictor", "CompressionRelationPredictor"]


class LinkPredictor(nn.Module):
    """Encoder–decoder link predictor (R-GCN → DistMult)."""

    num_nodes: int
    num_relations: int  # original relation count R
    emb_dim: int = 200  # nemb == encoder output width (reference models.py:93)
    hidden1_size: Optional[int] = None
    hidden2_size: Optional[int] = None
    num_layers: int = 1
    decomposition: Optional[str] = None
    num_bases: int = 0
    num_blocks: int = 0
    weight_init: str = "glorot-normal"
    include_gain: bool = False
    bias_init: Optional[str] = None
    self_loop_dropout: float = 0.0  # schlichtkrull-dropout rate, 0 = off
    decoder_l2_type: Optional[str] = None
    decoder_l2: float = 0.0
    decoder_weight_init: str = "standard-normal"
    decoder_include_gain: bool = False
    decoder_bias_init: Optional[str] = None
    # Narrow dtype ('bfloat16') for the structured decoder's backward only
    # (see DistMult.bwd_dtype); forward scores stay bit-identical.
    decoder_bwd_dtype: Optional[str] = None
    axis_name: Optional[str] = None
    # Mesh axes the *scoring batch* is sharded over; defaults to
    # ``axis_name``. On a 2-D (replica × edge) mesh the encoder reduces
    # over the edge axis only while the batch spans every device, so the
    # decoder's replicated-input gradients must psum over both axes
    # (see rgcn_tpu.dist.multihost).
    decoder_axis_name: Optional[object] = None
    # 'auto' | 'pallas' | 'xla' — forwarded to every RGCNConv (see
    # RGCNConv.backend); 'pallas' requires EdgeSets carrying layouts.
    backend: str = "auto"
    # Store node embeddings as ≤128-column parameter blocks: XLA's TPU row
    # gather has a fast path for input-buffer tables one lane tile wide
    # (~4× at d=200), and the input activation commutes with the gather —
    # the first basis layer then gathers straight from the parameters
    # (ops/pallas_basis.rel_spmm_basis_blocks_ad). Opt-in; changes the
    # parameter tree (node_embeddings_block{i}).
    feature_blocks: bool = False

    def _decoder_axes(self):
        return (
            self.decoder_axis_name
            if self.decoder_axis_name is not None
            else self.axis_name
        )

    def setup(self):
        if not 0 < self.num_layers < 3:
            raise ValueError("only 1 or 2 RGCN layers are supported")
        r_aug = 2 * self.num_relations + 1
        gain = rinit.relu_gain() if self.include_gain else 1.0
        emb_init = rinit.select_weight_init(self.weight_init, gain)
        if self.feature_blocks:
            widths = []
            rem = self.emb_dim
            while rem > 0:
                widths.append(min(128, rem))
                rem -= widths[-1]
            self.emb_blocks = tuple(
                self.param(
                    f"node_embeddings_block{i}", emb_init,
                    (self.num_nodes, w), jnp.float32,
                )
                for i, w in enumerate(widths)
            )
        else:
            self.node_embeddings = self.param(
                "node_embeddings", emb_init, (self.num_nodes, self.emb_dim), jnp.float32
            )
        self.node_embeddings_bias = self.param(
            "node_embeddings_bias",
            lambda key, shape, dtype=jnp.float32: jnp.zeros(shape, dtype),
            (1, self.emb_dim),
            jnp.float32,
        )

        nhid1 = self.hidden1_size or self.emb_dim
        self.rgc1 = self._make_conv(r_aug, self.emb_dim, nhid1)
        if self.num_layers == 2:
            nhid2 = self.hidden2_size or nhid1
            self.rgc2 = self._make_conv(r_aug, nhid1, nhid2)

        self.scoring_function = DistMult(
            num_nodes=self.num_nodes,
            num_relations=self.num_relations,
            emb_dim=self.emb_dim,
            weight_init=self.decoder_weight_init,
            weight_gain=self.decoder_include_gain,
            bias_init=self.decoder_bias_init,
            axis_name=self._decoder_axes(),
            backend=self.backend,
            bwd_dtype=self.decoder_bwd_dtype,
        )

    def _make_conv(self, r_aug: int, din: int, dout: int) -> RGCNConv:
        return RGCNConv(
            num_nodes=self.num_nodes,
            num_relations=r_aug,
            in_features=din,
            out_features=dout,
            decomposition=self.decomposition,
            num_bases=self.num_bases,
            num_blocks=self.num_blocks,
            separate_self_weight=(self.decomposition == "block"),
            weight_init=self.weight_init,
            weight_gain=self.include_gain,
            bias_init=self.bias_init,
            use_bias=self.bias_init is not None,
            self_loop_dropout=self.self_loop_dropout,
            axis_name=self.axis_name,
            backend=self.backend,
        )

    def encode(
        self,
        edges: EdgeSet,
        *,
        self_mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        """Node embeddings after message passing: ``(N, emb_dim)``."""
        if self.feature_blocks:
            x = nn.relu(
                jnp.concatenate(self.emb_blocks, axis=1)
                + self.node_embeddings_bias
            )
            input_blocks = (self.emb_blocks, self.node_embeddings_bias)
        else:
            x = nn.relu(self.node_embeddings + self.node_embeddings_bias)
            input_blocks = None
        x = self.rgc1(
            edges, x, self_mask=self_mask, deterministic=deterministic,
            input_blocks=input_blocks,
        )
        if self.num_layers == 2:
            x = nn.relu(x)
            x = self.rgc2(edges, x, self_mask=self_mask, deterministic=deterministic)
        return x

    def compute_penalty(
        self,
        triples: jax.Array,
        z: jax.Array,
        penalty_weights: Optional[jax.Array] = None,
        penalty_total: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Decoder L2 penalty (``models.py:95-103``).

        ``penalty_weights``/``penalty_total`` weight batch rows by
        ``w / total`` for padded or sharded batches: pad rows (weight 0)
        drop out, and per-shard values sum (e.g. under ``psum``) to the
        exact unpadded penalty. The batch-independent plain-L2 variant is
        scaled by ``sum(w) / total`` so shard partials also add up exactly.
        """
        if self.decoder_l2 == 0.0:
            return jnp.zeros(())
        if self.decoder_l2_type == "schlichtkrull-l2":
            return self.scoring_function.s_penalty(
                triples, z, weights=penalty_weights, total=penalty_total
            )
        l2 = self.scoring_function.l2_penalty()
        if penalty_weights is not None:
            total = (
                penalty_total
                if penalty_total is not None
                else jnp.sum(penalty_weights)
            )
            l2 = l2 * (jnp.sum(penalty_weights) / total)
        return l2

    def __call__(
        self,
        edges: EdgeSet,
        triples: jax.Array,
        *,
        self_mask: Optional[jax.Array] = None,
        deterministic: bool = True,
        penalty_weights: Optional[jax.Array] = None,
        penalty_total: Optional[jax.Array] = None,
        batch_layouts=None,  # host-built scoring-batch aggregation layouts
    ) -> Tuple[jax.Array, jax.Array]:
        z = self.encode(edges, self_mask=self_mask, deterministic=deterministic)
        if (
            batch_layouts is not None
            and self.decoder_l2 > 0.0
            and self.decoder_l2_type == "schlichtkrull-l2"
            and self.decoder_bias_init is None
            and self.scoring_function._use_pallas()
        ):
            # Fused score + penalty: the penalty cotangent rides the same
            # scatter-free aggregations as the score (otherwise its
            # backward adds two more per-triple row scatters into d z).
            bsz = triples.shape[0]
            if penalty_weights is not None:
                total = (
                    penalty_total
                    if penalty_total is not None
                    else jnp.sum(penalty_weights)
                )
                pw = penalty_weights / total
            else:
                pw = jnp.full((bsz,), 1.0 / bsz, jnp.float32)
            return self.scoring_function.score_with_s_penalty(
                triples, z, pw, batch_layouts
            )
        scores = self.scoring_function(triples, z, batch_layouts=batch_layouts)
        penalty = self.compute_penalty(
            triples, z,
            penalty_weights=penalty_weights,
            penalty_total=penalty_total,
        )
        return scores, penalty

    def structured_scores(
        self,
        edges: EdgeSet,
        positives: jax.Array,
        corrupt_head: jax.Array,
        corrupt_ent: jax.Array,
        pw: jax.Array,
        layouts,
        *,
        self_mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        """Training scores over [positives ; structured negatives] plus the
        schlichtkrull penalty — the production LP step path (host-drawn
        negatives, 2.5× fewer query gathers, fully scatter-free backward).
        Requires a bias-free schlichtkrull(-or-off) decoder."""
        z = self.encode(edges, self_mask=self_mask, deterministic=deterministic)
        return self.scoring_function.structured_scores_with_penalty(
            positives, corrupt_head, corrupt_ent, z, pw, layouts
        )

    # Evaluation sweeps (encode-once path) -------------------------------
    def score_heads(
        self, batch: jax.Array, z: jax.Array, candidate_slice=None
    ) -> jax.Array:
        return self.scoring_function.score_heads(
            batch, z, candidate_slice=candidate_slice
        )

    def score_tails(
        self, batch: jax.Array, z: jax.Array, candidate_slice=None
    ) -> jax.Array:
        return self.scoring_function.score_tails(
            batch, z, candidate_slice=candidate_slice
        )


class CompressionRelationPredictor(LinkPredictor):
    """c-RGCN: bottlenecked encoder with residual decode (``models.py:208-245``).

    The R-GCN runs at the compressed width ``hidden1_size``; DistMult scores
    live at ``emb_dim`` via the residual ``z = embeddings + decode(x)``.
    """

    def setup(self):
        if not 0 < self.num_layers < 3:
            raise ValueError("only 1 or 2 RGCN layers are supported")
        r_aug = 2 * self.num_relations + 1
        gain = rinit.relu_gain() if self.include_gain else 1.0
        emb_init = rinit.select_weight_init(self.weight_init, gain)
        self.node_embeddings = self.param(
            "node_embeddings", emb_init, (self.num_nodes, self.emb_dim), jnp.float32
        )
        self.node_embeddings_bias = self.param(
            "node_embeddings_bias",
            lambda key, shape, dtype=jnp.float32: jnp.zeros(shape, dtype),
            (1, self.emb_dim),
            jnp.float32,
        )

        nhid = self.hidden1_size or self.emb_dim
        self.encoding_layer = TorchLinear(features=nhid)
        self.decoding_layer = TorchLinear(features=self.emb_dim)
        self.rgc1 = self._make_conv(r_aug, nhid, nhid)
        if self.num_layers == 2:
            nhid2 = self.hidden2_size or nhid
            self.rgc2 = self._make_conv(r_aug, nhid, nhid2)

        self.scoring_function = DistMult(
            num_nodes=self.num_nodes,
            num_relations=self.num_relations,
            emb_dim=self.emb_dim,
            weight_init=self.decoder_weight_init,
            weight_gain=self.decoder_include_gain,
            bias_init=self.decoder_bias_init,
            axis_name=self._decoder_axes(),
            backend=self.backend,
            bwd_dtype=self.decoder_bwd_dtype,
        )

    def encode(
        self,
        edges: EdgeSet,
        *,
        self_mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        x = nn.relu(self.node_embeddings + self.node_embeddings_bias)
        x = self.encoding_layer(x)
        x = self.rgc1(edges, x, self_mask=self_mask, deterministic=deterministic)
        if self.num_layers == 2:
            x = nn.relu(x)
            x = self.rgc2(edges, x, self_mask=self_mask, deterministic=deterministic)
        return self.node_embeddings + self.decoding_layer(x)
