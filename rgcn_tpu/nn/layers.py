"""Neural-net layers: one R-GCN convolution and the DistMult scorer.

One :class:`RGCNConv` replaces both reference layers
(``RelationalGraphConvolutionNC`` and ``RelationalGraphConvolutionLP``,
``/root/reference/torch_rgcn/layers.py:101-565``): their vertical/horizontal/
featureless/diagonal forward paths are the same math (see
:mod:`rgcn_tpu.ops.spmm`), and their remaining differences — parameter
layout for block decomposition, initializer scheme, self-loop dropout mode —
are expressed as module attributes.

Decompositions are weight *producers* feeding the one SpMM primitive:

* ``None``   — full weights ``(R', din, dout)``
* ``basis``  — ``comps (R', nb) @ bases (nb, din, dout)``
  (``torch_rgcn/layers.py:242``)
* ``block``  — block-diagonal ``(R', B, din/B, dout/B)``, never expanded to
  the dense block matrix at runtime (``torch_rgcn/layers.py:534-543``)
* ``diag``   — per-relation vectors ``(R', din)`` (e-RGCN,
  ``torch_rgcn/layers.py:146-151,289-292``)

The self-loop relation (index ``R' - 1``) is applied densely:
``self_mask * dropout(X @ W_self)`` — one MXU matmul instead of ``N``
scattered edges (each node has exactly one self-loop, so its normalization
constant is 1).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from rgcn_tpu.graph.structure import EdgeSet
from rgcn_tpu.nn import init as rinit
from rgcn_tpu.ops import spmm as spmm_ops
from rgcn_tpu.ops import distmult as distmult_ops
from rgcn_tpu.ops.collectives import maybe_all_reduce, maybe_fanout

__all__ = ["RGCNConv", "DistMult", "TorchLinear"]



def _tpu_compute_dtype():
    """bf16 edge-stage compute dtype on real TPU backends, None elsewhere.

    The gather-dominated message paths run their tables/messages in bf16
    with f32 accumulation on hardware (XLA's f32 matmuls are one-pass
    bf16 on the MXU anyway; the bf16 gather halves the dominant HBM
    traffic), while CPU/interpret runs stay f32 for exactness tests.
    """
    return (
        jnp.bfloat16 if jax.default_backend() in ("tpu", "axon") else None
    )

class RGCNConv(nn.Module):
    """Relational graph convolution over a static :class:`EdgeSet`.

    Attributes:
      num_nodes: N.
      num_relations: augmented relation count ``R' = 2R + 1`` (last index is
        the self-loop relation), matching the reference's layer construction
        (``torch_rgcn/models.py:173,68``).
      in_features: input width; ``None`` means featureless one-hot input of
        width N (``torch_rgcn/layers.py:125``) — implemented as weight-row
        gathers, the one-hot matrix never exists.
      decomposition: ``None`` | ``'basis'`` | ``'block'``.
      separate_self_weight: LP block mode — blocks cover only the ``2R``
        general relations and a dense ``(din, dout)`` matrix handles the
        self-loop (``torch_rgcn/layers.py:375-378``).
      diag: per-relation diagonal weights (e-RGCN first layer); forces
        ``out = in`` and no bias (``torch_rgcn/layers.py:146-151``).
      weight_init / weight_gain / bias_init: initializer spec; NC layers use
        glorot-uniform with relu gain and zero bias
        (``torch_rgcn/layers.py:185-195``), LP layers take the config's
        ``weight_init``/``include_gain``/``bias_init``.
      self_loop_dropout: feature-dropout rate on the dense self-loop message
        ("schlichtkrull-dropout", ``torch_rgcn/layers.py:544-546``); active
        only when ``deterministic=False``.
      axis_name: if set, edge-partial aggregates are ``psum``-reduced over
        this mesh axis (edge-parallel sharding; see :mod:`rgcn_tpu.dist`).
    """

    num_nodes: int
    num_relations: int
    out_features: int
    in_features: Optional[int] = None
    decomposition: Optional[str] = None
    num_bases: int = 0
    num_blocks: int = 0
    diag: bool = False
    use_bias: bool = True
    separate_self_weight: bool = False
    weight_init: str = "glorot-uniform"
    weight_gain: bool = True
    bias_init: Optional[str] = "zeros"
    self_loop_dropout: float = 0.0
    axis_name: Optional[str] = None
    param_dtype: jnp.dtype = jnp.float32
    # 'auto' uses the fully-Pallas SpMM when the EdgeSet carries a
    # destination layout (static graphs); 'xla' forces the portable path.
    backend: str = "auto"

    def _gain(self) -> float:
        return rinit.relu_gain() if self.weight_gain else 1.0

    @nn.compact
    def __call__(
        self,
        edges: EdgeSet,
        x: Optional[jax.Array] = None,
        *,
        self_mask: Optional[jax.Array] = None,
        deterministic: bool = True,
        input_blocks=None,  # (param blocks, bias): block-gather basis path
    ) -> jax.Array:
        if (x is None) != (self.in_features is None):
            raise ValueError("features must be given iff in_features is set")

        n = self.num_nodes
        r_aug = self.num_relations
        din = self.in_features if self.in_features is not None else n
        dout = self.out_features
        gain = self._gain()
        w_init = rinit.select_weight_init(self.weight_init, gain)

        # ------------------------------------------------------------------
        # Parameters + message passing per weight layout.
        # ------------------------------------------------------------------
        if self.diag:
            if self.in_features is None:
                raise ValueError("diagonal weights require explicit features")
            weights = self.param(
                "weights", w_init, (r_aug, din), self.param_dtype
            )
            if self._use_pallas(edges) and edges.reverse is not None:
                # permute-free sorted-order messages (ops/pallas_diag.py);
                # bf16 messages on real TPUs (f32 accumulation in the
                # aggregation kernel) — halves the dominant HBM traffic
                from rgcn_tpu.ops.pallas_diag import rel_spmm_diag_ad

                cd = _tpu_compute_dtype()
                agg = rel_spmm_diag_ad(
                    edges, self._fan(x), self._fan(weights[:-1]),
                    compute_dtype=cd,
                )
            else:
                agg = spmm_ops.rel_spmm_diag(
                    edges, self._fan(x), self._fan(weights[:-1]),
                    aggregate=self._aggregate_fn(edges),
                )
            agg = self._reduce(agg)
            self_msg = x * weights[-1]
            out = agg + self._masked_self(self_msg, self_mask, deterministic)
            return out  # diag mode has no bias (torch_rgcn/layers.py:151)

        if self.decomposition is None:
            weights = self.param(
                "weights", w_init, (r_aug, din, dout), self.param_dtype
            )
            out = self._dense_path(edges, x, weights, self_mask, deterministic)
        elif self.decomposition == "basis":
            if self.num_bases <= 0:
                raise ValueError("basis decomposition needs num_bases > 0")
            bases = self.param(
                "bases", w_init, (self.num_bases, din, dout), self.param_dtype
            )
            comps = self.param(
                "comps", w_init, (r_aug, self.num_bases), self.param_dtype
            )
            if self.in_features is None:
                # Never expand comps @ bases to (R', N, dout) — gigabytes on
                # many-relation graphs (AM); contract per tile instead.
                # The aggregation-first kernel repeats the one-hot matmul
                # per basis (cost ∝ nb) — a win for small nb; many-basis
                # configs (AM: 40) stay on the per-tile contraction + one
                # Pallas aggregation, whose one-hot cost is nb-independent.
                if (
                    self._use_pallas(edges)
                    and edges.reverse is not None
                    and self.num_bases <= 8
                ):
                    from rgcn_tpu.ops.pallas_basis import (
                        rel_spmm_featureless_basis_ad,
                    )

                    cd = _tpu_compute_dtype()
                    agg = rel_spmm_featureless_basis_ad(
                        edges, self._fan(bases), self._fan(comps[:-1]),
                        compute_dtype=cd,
                    )
                else:
                    # bf16 gather table on real TPUs (f32 accumulation):
                    # halves the wide (nb·dout)-row gather bytes that
                    # dominate the many-basis featureless step (AM)
                    cd = _tpu_compute_dtype()
                    agg = spmm_ops.rel_spmm_featureless_basis(
                        edges, self._fan(bases), self._fan(comps[:-1]),
                        aggregate=self._aggregate_fn(edges),
                        compute_dtype=cd,
                    )
                agg = self._reduce(agg)
                self_msg = jnp.einsum("b,bio->io", comps[-1], bases)
                out = agg + self._masked_self(self_msg, self_mask, deterministic)
            elif (
                self._use_pallas(edges)
                and edges.reverse is not None
                and self.num_bases <= 8  # one-hot cost ∝ nb; expand beyond
            ):
                # Aggregation-first basis path: no weight expansion, no
                # relation grouping — see rgcn_tpu.ops.pallas_basis. On
                # real TPUs the edge stage runs bf16 (f32 accumulation):
                # XLA's f32 matmuls are one-pass bf16 on the MXU anyway,
                # and the bf16 gather halves the dominant HBM traffic. The
                # CPU/interpret path stays f32 for exactness tests.
                cd = _tpu_compute_dtype()
                if input_blocks is not None:
                    # gather straight from the ≤128-column embedding
                    # parameter blocks with the input activation fused
                    # (measured ~2× slower than monolithic at WN18 scale
                    # — see ops/pallas_basis.py; supported, not default)
                    from rgcn_tpu.ops.pallas_basis import (
                        rel_spmm_basis_blocks_ad,
                    )

                    blocks, in_bias = input_blocks
                    agg = rel_spmm_basis_blocks_ad(
                        edges,
                        tuple(self._fan(b) for b in blocks),
                        self._fan(in_bias),
                        self._fan(bases), self._fan(comps[:-1]),
                        compute_dtype=cd,
                    )
                else:
                    from rgcn_tpu.ops.pallas_basis import rel_spmm_basis_ad

                    agg = rel_spmm_basis_ad(
                        edges, self._fan(x), self._fan(bases),
                        self._fan(comps[:-1]), compute_dtype=cd,
                    )
                agg = self._reduce(agg)
                self_msg = x @ jnp.einsum("b,bio->io", comps[-1], bases)
                out = agg + self._masked_self(
                    self_msg, self_mask, deterministic
                )
            elif edges.pairs is not None:
                # Many-basis featureful path (AM layer 2: nb=40, 10→11):
                # precompute H = stack_b(X @ bases_b) and contract once per
                # unique (src, rel) pair — the per-tile expanded-weight
                # matmuls at narrow (din, dout) waste the MXU and measured
                # ~9x slower at AM scale (ops/spmm.py::rel_spmm_basis_pairs)
                cd = _tpu_compute_dtype()
                agg = spmm_ops.rel_spmm_basis_pairs(
                    edges, self._fan(x), self._fan(bases),
                    self._fan(comps[:-1]),
                    aggregate=self._aggregate_fn(edges),
                    compute_dtype=cd,
                )
                agg = self._reduce(agg)
                self_msg = x @ jnp.einsum("b,bio->io", comps[-1], bases)
                out = agg + self._masked_self(
                    self_msg, self_mask, deterministic
                )
            else:
                weights = jnp.einsum("rb,bio->rio", comps, bases)
                out = self._dense_path(
                    edges, x, weights, self_mask, deterministic
                )
        elif self.decomposition == "block":
            out = self._block_path(edges, x, self_mask, deterministic)
        else:
            raise NotImplementedError(
                f"{self.decomposition!r} decomposition has not been implemented"
            )

        if self.use_bias and self.bias_init is not None:
            b_init = rinit.select_bias_init(self.bias_init)
            bias = self.param("bias", b_init, (dout,), self.param_dtype)
            out = out + bias
        return out

    # ----------------------------------------------------------------------
    def _use_pallas(self, edges: EdgeSet) -> bool:
        return edges.layout is not None and (
            self.backend == "pallas"
            or (
                self.backend == "auto"
                and jax.default_backend() in ("tpu", "axon")
            )
        )

    def _aggregate_fn(self, edges: EdgeSet):
        """Destination-reduction override for message-only SpMM variants:
        the differentiable Pallas sorted aggregation when a layout exists,
        XLA segment_sum otherwise."""
        if not self._use_pallas(edges):
            return None
        from rgcn_tpu.ops.pallas_aggregate import aggregate_messages_ad

        return aggregate_messages_ad

    def _reduce(self, agg: jax.Array) -> jax.Array:
        """Cross-shard reduction of edge-partial aggregates. Uses the
        manual-AD :func:`~rgcn_tpu.ops.collectives.all_reduce` (backward =
        identity); its counterpart :meth:`_fan` wraps every replicated
        input to the per-shard edge computation. Together they make the
        differentiated ``shard_map(check_vma=False)`` step exact — see
        :mod:`rgcn_tpu.ops.collectives` for why vma checking is off."""
        return maybe_all_reduce(agg, self.axis_name)

    def _fan(self, x: jax.Array) -> jax.Array:
        """Mark a replicated value entering per-shard edge computation
        (backward = ``psum`` of the shards' partial cotangents)."""
        return maybe_fanout(x, self.axis_name)

    def _masked_self(
        self,
        self_msg: jax.Array,
        self_mask: Optional[jax.Array],
        deterministic: bool,
    ) -> jax.Array:
        if self.self_loop_dropout > 0.0:
            self_msg = nn.Dropout(rate=self.self_loop_dropout)(
                self_msg, deterministic=deterministic
            )
        if self_mask is not None:
            self_msg = self_msg * self_mask
        return self_msg

    def _dense_path(self, edges, x, weights, self_mask, deterministic):
        if self.in_features is None:
            # Featureless: weights are (R', N, dout); gather rows.
            agg = spmm_ops.rel_spmm_featureless(
                edges, self._fan(weights[:-1]),
                aggregate=self._aggregate_fn(edges),
            )
            agg = self._reduce(agg)
            self_msg = weights[-1]  # X = I → node v receives W_self[v]
        else:
            if self._use_pallas(edges) and edges.reverse is not None:
                from rgcn_tpu.ops.pallas_spmm import rel_spmm_pallas_ad

                agg = rel_spmm_pallas_ad(
                    edges, self._fan(x), self._fan(weights[:-1])
                )
            else:
                agg = spmm_ops.rel_spmm(
                    edges, self._fan(x), self._fan(weights[:-1])
                )
            agg = self._reduce(agg)
            self_msg = x @ weights[-1]
        return agg + self._masked_self(self_msg, self_mask, deterministic)

    # Expanding block-diagonal weights costs R'·din·dout memory; cap it.
    _BLOCK_EXPAND_MAX_ELEMS = 64_000_000

    def _block_messages(self, edges, x, blocks):
        """Block-diagonal general-relation messages + aggregation.

        On the Pallas path the blocks are EXPANDED to dense per-relation
        matrices and run through the dense SpMM kernels: XLA lowers the
        blockwise einsum (e.g. FB-toy: 100 blocks of 2×2) to thousands of
        tiny batched matmuls that measure ~4× slower than the dense
        kernel's wastefully-dense-but-MXU-shaped compute. Parameters stay
        decomposed (that is the point of the decomposition); the expansion
        is a cheap traced scatter whose autodiff maps gradients back to
        the blocks."""
        r, nb, ib, ob = blocks.shape
        din, dout = nb * ib, nb * ob
        if (
            self._use_pallas(edges)
            and edges.reverse is not None
            and r * din * dout <= self._BLOCK_EXPAND_MAX_ELEMS
        ):
            from rgcn_tpu.ops.pallas_spmm import rel_spmm_pallas_ad

            rows = jnp.arange(din)
            blk = rows // ib
            cols = blk[:, None] * ob + jnp.arange(ob)[None, :]  # (din, ob)
            w_dense = jnp.zeros((r, din, dout), blocks.dtype)
            w_dense = w_dense.at[:, rows[:, None], cols].set(
                blocks.reshape(r, din, ob)
            )
            return rel_spmm_pallas_ad(
                edges, self._fan(x), self._fan(w_dense)
            )
        return spmm_ops.rel_spmm_block(
            edges, self._fan(x), self._fan(blocks),
            aggregate=self._aggregate_fn(edges),
        )

    def _block_path(self, edges, x, self_mask, deterministic):
        if self.num_blocks <= 0:
            raise ValueError("block decomposition needs num_blocks > 0")
        din = self.in_features if self.in_features is not None else self.num_nodes
        dout = self.out_features
        if din % self.num_blocks or dout % self.num_blocks:
            raise ValueError(
                f"block decomposition needs dims ({din}, {dout}) divisible by "
                f"num_blocks ({self.num_blocks})"
            )
        ib, ob = din // self.num_blocks, dout // self.num_blocks
        if self.in_features is None:
            raise NotImplementedError(
                "featureless block decomposition is unused by the reference "
                "model family (block LP layers always receive embeddings)"
            )

        if self.separate_self_weight:
            # LP layout: blocks for 2R general relations + dense self matrix,
            # both with the reference's bespoke Schlichtkrull fan
            # (torch_rgcn/layers.py:375-378,428-436).
            fan_shape = ((self.num_relations - 1) // 2, ib)
            blk_init = rinit.schlichtkrull_normal(self._gain(), fan_shape)
            blocks = self.param(
                "blocks",
                blk_init,
                (self.num_relations - 1, self.num_blocks, ib, ob),
                self.param_dtype,
            )
            self_weight = self.param(
                "self_weight", blk_init, (din, dout), self.param_dtype
            )
            agg = self._block_messages(edges, x, blocks)
            agg = self._reduce(agg)
            self_msg = x @ self_weight
        else:
            # NC layout: blocks cover all R' relations incl. the self-loop
            # (torch_rgcn/layers.py:169-170).
            w_init = rinit.select_weight_init(self.weight_init, self._gain())
            blocks = self.param(
                "blocks",
                w_init,
                (self.num_relations, self.num_blocks, ib, ob),
                self.param_dtype,
            )
            agg = self._block_messages(edges, x, blocks[:-1])
            agg = self._reduce(agg)
            xb = x.reshape(self.num_nodes, self.num_blocks, ib)
            self_msg = jnp.einsum("nbi,bio->nbo", xb, blocks[-1]).reshape(
                self.num_nodes, dout
            )
        return agg + self._masked_self(self_msg, self_mask, deterministic)


class DistMult(nn.Module):
    """DistMult triple scorer (``torch_rgcn/layers.py:9-98``).

    ``relations`` has shape ``(num_relations, emb_dim)`` — the reference
    constructs it as ``(indim=nrel, outdim=nemb)`` (``models.py:93``).
    """

    num_nodes: int
    num_relations: int  # original relation count R
    emb_dim: int
    weight_init: str = "standard-normal"
    weight_gain: bool = False
    bias_init: Optional[str] = None
    param_dtype: jnp.dtype = jnp.float32
    # When scoring a *sharded* triple batch inside a differentiated
    # shard_map(check_vma=False): replicated inputs (node embeddings,
    # relation weights, biases) must be fanout-marked so their gradients
    # psum the per-shard partials (see rgcn_tpu.ops.collectives).
    axis_name: Optional[str] = None
    # 'auto' | 'pallas' | 'xla': 'pallas' (or 'auto' on TPU) swaps the
    # bias-free scorer for the scatter-free custom-VJP version
    # (ops/pallas_distmult.py) — the backward's two per-triple row
    # scatter-adds into d nodes become Pallas one-hot aggregations.
    backend: str = "auto"
    # Optional narrow dtype (e.g. 'bfloat16') for the structured scorer's
    # BACKWARD only — halves its gather-table and residual bytes, forward
    # scores stay bit-identical, gradients lose mantissa (opt-in; see
    # ops/pallas_distmult.py::distmult_structured_agg_ad).
    bwd_dtype: Optional[str] = None

    def _fan(self, x):
        return maybe_fanout(x, self.axis_name)

    def _use_pallas(self) -> bool:
        return self.backend == "pallas" or (
            self.backend == "auto"
            and jax.default_backend() in ("tpu", "axon")
        )

    def setup(self):
        gain = rinit.relu_gain() if self.weight_gain else 1.0
        w_init = rinit.select_weight_init(self.weight_init, gain)
        self.relations = self.param(
            "relations", w_init, (self.num_relations, self.emb_dim), self.param_dtype
        )
        if self.bias_init is not None:
            b_init = rinit.select_bias_init(self.bias_init)
            self.sbias = self.param("sbias", b_init, (self.num_nodes,), self.param_dtype)
            self.obias = self.param("obias", b_init, (self.num_nodes,), self.param_dtype)
            self.pbias = self.param("pbias", b_init, (self.num_relations,), self.param_dtype)
        else:
            self.sbias = self.obias = self.pbias = None

    def __call__(
        self,
        triples: jax.Array,
        nodes: jax.Array,
        batch_layouts=None,
    ) -> jax.Array:
        fan = self._fan
        if (
            batch_layouts is not None
            and self.sbias is None
            and self._use_pallas()
        ):
            from rgcn_tpu.ops.pallas_distmult import distmult_score_agg_ad

            return distmult_score_agg_ad(
                triples, fan(nodes), fan(self.relations), batch_layouts
            )
        return distmult_ops.distmult_score(
            triples, fan(nodes), fan(self.relations),
            sbias=None if self.sbias is None else fan(self.sbias),
            pbias=None if self.pbias is None else fan(self.pbias),
            obias=None if self.obias is None else fan(self.obias),
        )

    def score_with_s_penalty(
        self,
        triples: jax.Array,
        nodes: jax.Array,
        pw: jax.Array,
        batch_layouts,
    ):
        """Fused ``(scores, schlichtkrull penalty)`` with the scatter-free
        backward (``pw`` = per-row penalty weights; see
        ops/pallas_distmult.py). Bias-free scoring only."""
        from rgcn_tpu.ops.pallas_distmult import (
            distmult_score_spenalty_agg_ad,
        )

        fan = self._fan
        return distmult_score_spenalty_agg_ad(
            triples, fan(nodes), fan(self.relations), pw, batch_layouts
        )

    def structured_scores_with_penalty(
        self,
        positives: jax.Array,
        corrupt_head: jax.Array,
        corrupt_ent: jax.Array,
        nodes: jax.Array,
        pw: jax.Array,
        layouts,
    ):
        """Structured-negatives ``(scores, schlichtkrull penalty)`` with the
        scatter-free backward (see ops/pallas_distmult.py): 3P + Ns query
        row gathers instead of 3(P + Ns). Bias-free scoring only."""
        from rgcn_tpu.ops.pallas_distmult import distmult_structured_agg_ad

        fan = self._fan
        return distmult_structured_agg_ad(
            positives, corrupt_head, corrupt_ent,
            fan(nodes), fan(self.relations), pw, layouts,
            bwd_dtype=self.bwd_dtype,
        )

    def s_penalty(
        self,
        triples: jax.Array,
        nodes: jax.Array,
        weights: Optional[jax.Array] = None,
        total: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Schlichtkrull L2: mean of squares of the embeddings used in the
        batch (``torch_rgcn/layers.py:77-84``).

        ``weights``/``total`` support padded/sharded batches: rows are
        weighted by ``weights / total`` (``total`` defaults to
        ``sum(weights)``), so zero-weight pad rows contribute nothing and
        per-shard partial sums add up to the exact unpadded value.
        """
        s = triples[..., 0]
        p = triples[..., 1]
        o = triples[..., 2]
        nodes = self._fan(nodes)
        relations = self._fan(self.relations)
        per_row = (
            jnp.mean(nodes[s] ** 2, axis=-1)
            + jnp.mean(relations[p] ** 2, axis=-1)
            + jnp.mean(nodes[o] ** 2, axis=-1)
        )
        if weights is None:
            return jnp.mean(per_row)
        if total is None:
            total = jnp.sum(weights)
        return jnp.sum(per_row * weights) / total

    def l2_penalty(self) -> jax.Array:
        """Plain sum-of-squares of the relation matrix
        (``torch_rgcn/models.py:103``)."""
        return jnp.sum(self.relations ** 2)

    def score_heads(
        self, batch: jax.Array, nodes: jax.Array, candidate_slice=None
    ) -> jax.Array:
        return distmult_ops.score_head_candidates(
            batch, nodes, self.relations,
            sbias=self.sbias, pbias=self.pbias, obias=self.obias,
            candidate_slice=candidate_slice,
        )

    def score_tails(
        self, batch: jax.Array, nodes: jax.Array, candidate_slice=None
    ) -> jax.Array:
        return distmult_ops.score_tail_candidates(
            batch, nodes, self.relations,
            sbias=self.sbias, pbias=self.pbias, obias=self.obias,
            candidate_slice=candidate_slice,
        )


class TorchLinear(nn.Module):
    """Dense layer with torch ``nn.Linear`` default initialization.

    Used by the c-RGCN bottleneck (``torch_rgcn/models.py:224-225``).
    """

    features: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        din = x.shape[-1]
        kernel = self.param(
            "kernel", rinit.torch_linear_weight(), (din, self.features), self.param_dtype
        )
        bias = self.param(
            "bias", rinit.torch_linear_bias(din), (self.features,), self.param_dtype
        )
        return x @ kernel + bias
