"""Multi-chip training steps: edge-partitioned encoder + data-parallel decoder.

Pattern (validated numerically against single-device gradients in
``tests/test_dist.py``): the whole loss/grad computation runs under
``jax.shard_map`` over a 1-D ``edge`` mesh axis;

* :class:`EdgeSet` arrays are sharded along their tile axis — each device
  aggregates its local edges; the layer's internal ``lax.psum``
  (``RGCNConv(axis_name="edge")``) reduces partial node sums over ICI;
* the scoring batch (positives + negatives) is sharded along the same axis
  (data parallelism for the decoder);
* the local loss contribution is reduced *inside* the differentiated
  function with the manual-AD collectives of
  :mod:`rgcn_tpu.ops.collectives` (``all_reduce`` at every
  varying→replicated reduction, ``fanout`` at every replicated→varying
  boundary — applied inside ``RGCNConv``/``DistMult`` via ``axis_name``),
  so gradients are exact by construction under ``check_vma=False``. vma
  checking must be OFF because the Pallas kernels cannot run under it
  (see the collectives module docstring); exactness is instead enforced
  by ``tests/test_dist.py`` against the single-device computation for
  both the XLA and Pallas backends.

Parameters and node features are replicated: for relational graphs the edge
list dominates memory and FLOPs (N·d and R·d² are small next to E·d), so
edge partitioning is the scaling axis that matters — the analog of the
reference's missing distribution story (it is strictly single-device,
``/root/reference/experiments/classify_nodes.py:46-47``).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P

from rgcn_tpu.dist.mesh import EDGE_AXIS
from rgcn_tpu.graph.dynamic import build_edge_set_dynamic
from rgcn_tpu.ops.collectives import all_reduce
from rgcn_tpu.train.negative import corrupt_batch

__all__ = [
    "make_sharded_nc_step",
    "make_sharded_lp_step",
    "make_sharded_lp_step_hosted",
    "make_sharded_lp_step_hosted_structured",
    "pad_to_multiple",
]


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def make_sharded_nc_step(
    model,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    train_idx: jax.Array,
    train_lbl: jax.Array,
    layer1_l2: float = 0.0,
    embedding_l2: float = 0.0,
    axis_name: str = EDGE_AXIS,
) -> Callable:
    """Jitted full-batch node-classification step over an edge-sharded graph.

    ``model`` must be built with ``axis_name=axis_name``. The EdgeSet passed
    to the returned step must have its tile count divisible by the mesh axis
    size (``build_edge_set(..., tile_multiple=mesh_size)``). To run the
    Pallas kernels per shard, build the model with ``backend='pallas'`` and
    attach per-shard layouts first
    (:func:`rgcn_tpu.dist.mesh.prepare_sharded_layouts`).
    """
    espec = P(axis_name)

    @jax.jit
    def step(params, opt_state, edges):
        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(), espec),
            out_specs=(P(), P()),
            # manual-AD collectives inside the model make gradients exact
            # without vma tracking (required for the Pallas kernels) — see
            # rgcn_tpu.ops.collectives
            check_vma=False,
        )
        def loss_and_grads(params, edges):
            def loss_fn(p):
                logits = model.apply(p, edges)  # replicated after layer psum
                loss = optax.softmax_cross_entropy_with_integer_labels(
                    logits[train_idx], train_lbl
                ).mean()
                if layer1_l2 > 0.0:
                    loss = loss + layer1_l2 * model.layer1_l2(p)
                if embedding_l2 > 0.0:
                    loss = loss + embedding_l2 * model.embedding_l2(p)
                return loss

            return jax.value_and_grad(loss_fn)(params)

        loss, grads = loss_and_grads(params, edges)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def make_sharded_lp_step(
    model,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    num_nodes: int,
    num_rels: int,
    tile_size: int,
    num_negatives: int,
    head_prob: float,
    general_dropout: float = 0.0,
    structural_self_keep: Optional[float] = None,
    decoder_l2_weight: float = 0.0,
    axis_name: str = EDGE_AXIS,
    backend: str = "auto",
    row_block: int = 256,
) -> Callable:
    """Jitted link-prediction step: in-jit graph build + sharded loss/grad.

    The dynamic EdgeSet is built once per step (replicated — it is O(E)
    integer work), sharded by tiles via ``with_sharding_constraint``-style
    shard_map specs; the scoring batch is padded to the mesh size and
    sharded with per-row weights so padding rows contribute zero loss.

    ``backend='pallas'`` (with a model built the same way) makes each shard
    construct the destination layout + reversed structure for its *local*
    edge slice inside the shard_map, so both the forward and the custom-VJP
    backward run the Pallas kernels per shard before the cross-shard
    reduction.

    Works on 1-D and 2-D meshes. On a 2-D ``(replica, edge)`` mesh
    (:func:`rgcn_tpu.dist.multihost.make_mesh_2d`): the EdgeSet is sharded
    over the ``edge`` axis (replicated across replicas — layer psums ride
    the fast axis), the scoring batch is sharded over *every* device, and
    the loss/decoder gradients reduce over both axes. Build the model with
    ``axis_name=<edge axis>`` and
    ``decoder_axis_name=tuple(mesh.axis_names)``.
    """
    all_axes = tuple(mesh.axis_names)
    n_shards = mesh.size  # scoring-batch shards (all devices)
    espec = P(axis_name)
    bspec = P(all_axes)  # batch dim sharded over the whole mesh
    use_pallas = backend == "pallas"

    @jax.jit
    def step(params, opt_state, positives, key):
        k_neg, k_drop, k_self, k_sl = jax.random.split(key, 4)
        batch, labels = corrupt_batch(
            k_neg, positives, num_nodes, num_negatives, head_prob
        )
        real = batch.shape[0]
        padded = pad_to_multiple(real, n_shards)
        weights = jnp.concatenate(
            [jnp.ones((real,)), jnp.zeros((padded - real,))]
        )
        batch = jnp.concatenate(
            [batch, jnp.zeros((padded - real, 3), batch.dtype)], axis=0
        )
        labels = jnp.concatenate([labels, jnp.zeros((padded - real,))])

        edges = build_edge_set_dynamic(
            positives,
            num_nodes,
            num_rels,
            tile_size=tile_size,
            dropout_rate=general_dropout,
            dropout_key=k_drop,
            tile_multiple=n_shards,
        )
        if structural_self_keep is not None:
            self_mask = jax.random.bernoulli(
                k_self, structural_self_keep, (num_nodes, 1)
            ).astype(jnp.float32)
        else:
            self_mask = None

        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(), espec, bspec, bspec, bspec, P(), P()),
            out_specs=(P(), P()),
            # manual-AD collectives (rgcn_tpu.ops.collectives) make the
            # gradients exact without vma tracking, which the Pallas
            # kernels require to be off
            check_vma=False,
        )
        def loss_and_grads(params, edges, batch, labels, weights, self_mask, k_sl):
            if use_pallas:
                # per-shard Pallas layouts for the local edge slice
                # (integer preprocessing, not differentiated)
                import dataclasses

                from rgcn_tpu.graph.dynamic import (
                    _reverse_edge_set_dynamic,
                    build_dst_layout_dynamic,
                )

                layout = build_dst_layout_dynamic(
                    edges.dst, edges.num_nodes,
                    row_block=row_block, chunk=edges.tile_size,
                )
                rev = _reverse_edge_set_dynamic(
                    edges, row_block, edges.tile_size
                )
                edges = dataclasses.replace(edges, layout=layout, reverse=rev)

            def loss_fn(p):
                scores, penalty = model.apply(
                    p,
                    edges,
                    batch,
                    self_mask=self_mask,
                    deterministic=False,
                    rngs={"dropout": k_sl},
                    # penalty rows weighted by w/real: pad triples (0,0,0)
                    # contribute nothing and the psum below reassembles the
                    # exact single-device penalty (no shard-mean approximation)
                    penalty_weights=weights,
                    penalty_total=jnp.asarray(real, jnp.float32),
                )
                bce = optax.sigmoid_binary_cross_entropy(scores, labels)
                # local sum over the batch shard; static global count `real`
                local = jnp.sum(bce * weights) / real
                local = local + decoder_l2_weight * penalty
                return all_reduce(local, all_axes)

            return jax.value_and_grad(loss_fn)(params)

        loss, grads = loss_and_grads(
            params, edges, batch, labels, weights, self_mask, k_sl
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def make_sharded_lp_step_hosted(
    model,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    num_nodes: int,
    structural_self_keep: Optional[float] = None,
    decoder_l2_weight: float = 0.0,
    axis_name: str = EDGE_AXIS,
) -> Callable:
    """Sharded LP step consuming HOST-built inputs — the production
    multi-chip shape: per-shard EdgeSets with Pallas layouts from
    :func:`rgcn_tpu.dist.host.build_sharded_epoch_host` (stacked leaf-wise
    over the edge axis) and a host-drawn scoring batch. No device sorts,
    no in-jit graph work; the epoch pipeline overlaps all of it.

    The returned step signature:
    ``step(params, opt_state, stacked_edges, batch, labels, key)``.
    """
    all_axes = tuple(mesh.axis_names)
    n_shards = mesh.size
    espec = P(axis_name)
    bspec = P(all_axes)

    @jax.jit
    def step(params, opt_state, stacked_edges, batch, labels, key):
        k_self, k_sl = jax.random.split(key)
        real = batch.shape[0]
        padded = pad_to_multiple(real, n_shards)
        weights = jnp.concatenate(
            [jnp.ones((real,)), jnp.zeros((padded - real,))]
        )
        batch = jnp.concatenate(
            [jnp.asarray(batch), jnp.zeros((padded - real, 3), jnp.int32)],
            axis=0,
        )
        labels = jnp.concatenate(
            [jnp.asarray(labels), jnp.zeros((padded - real,))]
        )
        if structural_self_keep is not None:
            self_mask = jax.random.bernoulli(
                k_self, structural_self_keep, (num_nodes, 1)
            ).astype(jnp.float32)
        else:
            self_mask = None

        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(), espec, bspec, bspec, bspec, P(), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
        def loss_and_grads(params, es_stacked, batch, labels, weights,
                           self_mask, k_sl):
            # strip the stacking dimension: every leaf arrives (1, ...)
            edges = jax.tree.map(lambda a: a[0], es_stacked)

            def loss_fn(p):
                scores, penalty = model.apply(
                    p,
                    edges,
                    batch,
                    self_mask=self_mask,
                    deterministic=False,
                    rngs={"dropout": k_sl},
                    penalty_weights=weights,
                    penalty_total=jnp.asarray(real, jnp.float32),
                )
                bce = optax.sigmoid_binary_cross_entropy(scores, labels)
                local = jnp.sum(bce * weights) / real
                local = local + decoder_l2_weight * penalty
                return all_reduce(local, all_axes)

            return jax.value_and_grad(loss_fn)(params)

        loss, grads = loss_and_grads(
            params, stacked_edges, batch, labels, weights, self_mask, k_sl
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def make_sharded_lp_step_hosted_structured(
    model,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    *,
    decoder_l2_weight: float = 0.0,
    want_penalty: bool = True,
    structural_self_keep: Optional[float] = None,
    num_nodes: Optional[int] = None,
    axis_name: str = EDGE_AXIS,
) -> Callable:
    """Sharded LP step with the STRUCTURED production decoder.

    The plain hosted step scores the assembled ``[positives ; negatives]``
    batch with 3(P + Ns) query gathers and XLA scatter backwards; this one
    runs the single-device production decoder per shard — 3P + Ns gathers,
    sorted scatter-free backward (`ops/pallas_distmult.py`) — over the
    host-built per-shard structured inputs from
    :func:`rgcn_tpu.dist.host.build_sharded_structured_host` (stacked with
    a leading ``mesh.size`` dim; edges stacked over the edge axis as
    usual). Pad rows carry zero loss/penalty weight, and the decoder's
    fanout marks make per-shard gradient partials psum exactly — same
    contract as every other step here (``tests/test_dist.py``).

    Step signature: ``step(params, opt_state, stacked_edges, structured,
    key)`` with ``structured = (pos, ch, ce, labels, weights, layouts)``.
    """
    all_axes = tuple(mesh.axis_names)
    espec = P(axis_name)
    bspec = P(all_axes)

    @jax.jit
    def step(params, opt_state, stacked_edges, structured, key):
        k_self, k_sl = jax.random.split(key)
        if structural_self_keep is not None:
            self_mask = jax.random.bernoulli(
                k_self, structural_self_keep, (num_nodes, 1)
            ).astype(jnp.float32)
        else:
            self_mask = None

        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(), espec, bspec, P(), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
        def loss_and_grads(params, es_stacked, struct, self_mask, k_sl):
            edges = jax.tree.map(lambda a: a[0], es_stacked)
            pos, ch, ce, labels, w, lays = jax.tree.map(
                lambda a: a[0], struct
            )
            # global real row count (pads carry weight 0; not
            # differentiated, so a bare psum via all_reduce is fine)
            total = all_reduce(jnp.sum(w), all_axes)
            pw = (w / total) if want_penalty else jnp.zeros_like(w)

            def loss_fn(p):
                scores, penalty = model.apply(
                    p, edges, pos, ch, ce, pw, lays,
                    method=model.structured_scores,
                    self_mask=self_mask,
                    deterministic=False,
                    rngs={"dropout": k_sl},
                )
                bce = optax.sigmoid_binary_cross_entropy(scores, labels)
                local = jnp.sum(bce * w) / total
                local = local + decoder_l2_weight * penalty
                return all_reduce(local, all_axes)

            return jax.value_and_grad(loss_fn)(params)

        loss, grads = loss_and_grads(
            params, stacked_edges, structured, self_mask, k_sl
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
