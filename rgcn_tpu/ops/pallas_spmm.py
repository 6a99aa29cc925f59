"""Pallas TPU kernels for the relational SpMM message stage.

The XLA path (:mod:`rgcn_tpu.ops.spmm`) computes messages as
``einsum('tbi,tio->tbo', X[src], W[tile_rel])`` — XLA materializes the
per-tile weight gather ``W[tile_rel]`` in HBM, which for a WN18-shaped
workload moves ~100-200 MB of redundant weight traffic per step (tiles share
only ~2R distinct relations).

``rel_spmm_messages`` replaces that stage with a Pallas kernel whose weight
block is indexed *by the scalar-prefetched tile relation*: the TPU grid is
sequential and edges are relation-sorted, so consecutive tiles usually hit
the same relation and Pallas skips the re-DMA — each distinct ``W_r`` is
copied to VMEM ≈ once per kernel launch (R copies total instead of
``n_tiles``). The degree-normalization multiply is fused into the same
kernel, eliminating one full read+write of the message buffer.

Aggregation (scatter by destination) stays in XLA's ``segment_sum`` — the
destinations are sorted within each relation segment, and XLA's sorted
scatter is already bandwidth-bound (measured; see benchmarks/).

Kernel playbook reference: /opt/skills/guides/pallas_guide.md.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rgcn_tpu.graph.structure import EdgeSet
from rgcn_tpu.ops.spmm import aggregate_messages

__all__ = [
    "rel_spmm_messages",
    "rel_spmm_pallas",
    "rel_spmm_pallas_full",
    "rel_spmm_pallas_ad",
]


def _auto_interpret(interpret: Optional[bool]) -> bool:
    """Pallas compiles only on TPU here; other backends use the interpreter
    (tests). The tunneled TPU registers as platform 'axon'."""
    if interpret is not None:
        return interpret
    return jax.default_backend() not in ("tpu", "axon")


def _msgs_kernel(tile_rel_ref, xg_ref, w_ref, val_ref, out_ref):
    """One grid step = one relation-uniform tile of edges.

    xg_ref: (1, T, din) gathered source features
    w_ref:  (1, din, dout) — weight of this tile's relation (auto-DMA'd only
            when the prefetched tile_rel changes between grid steps)
    val_ref: (1, 1, T) per-edge normalization (0 for pads/dropped edges);
             3-D so the block's trailing dims satisfy TPU tiling rules
    out_ref: (1, T, dout)
    """
    del tile_rel_ref  # only used by the index maps
    msgs = jnp.dot(
        xg_ref[0], w_ref[0], preferred_element_type=jnp.float32
    )
    out_ref[0] = (msgs * val_ref[0, 0][:, None]).astype(out_ref.dtype)


def rel_spmm_messages(
    edges: EdgeSet,
    x: jax.Array,
    weights: jax.Array,
    *,
    out_dtype: Optional[jnp.dtype] = None,
    interpret: Optional[bool] = None,
    input_fusion: bool = False,
) -> jax.Array:
    """Fused (gathered-features × per-relation weight × normalization).

    Args:
      edges: relation-sorted tile-padded edge set.
      x: node features ``(N, din)``; the source gather itself stays in XLA
         (a hardware-native dynamic-gather).
      weights: ``(num_rels, din, dout)`` general-relation weights.
      input_fusion: permit XLA to compute the source gather in the
        kernel's input pipeline (``mosaic.allow_input_fusion``).

    Returns messages ``(E_pad, dout)`` ready for destination aggregation.
    """
    interpret = _auto_interpret(interpret)
    tile = edges.tile_size
    n_tiles = edges.num_tiles
    din = x.shape[-1]
    dout = weights.shape[-1]
    out_dtype = out_dtype or weights.dtype

    xg = x[edges.src].reshape(n_tiles, tile, din)
    val = edges.val.reshape(n_tiles, 1, tile)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (1, tile, din), lambda i, tr: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, din, dout), lambda i, tr: (tr[i], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, tile), lambda i, tr: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tile, dout), lambda i, tr: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )

    compiler_params = None
    if input_fusion and not interpret:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            allow_input_fusion=[True, False, False],  # [xg, w, val]
        )

    msgs = pl.pallas_call(
        _msgs_kernel,
        grid_spec=grid_spec,
        compiler_params=compiler_params,
        out_shape=jax.ShapeDtypeStruct((n_tiles, tile, dout), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_tiles * tile * din * dout,
            bytes_accessed=(
                n_tiles * tile * din * xg.dtype.itemsize
                + weights.size * weights.dtype.itemsize
                + n_tiles * tile * dout * jnp.dtype(out_dtype).itemsize
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(edges.tile_rel, xg, weights, val)

    return msgs.reshape(n_tiles * tile, dout)


def rel_spmm_pallas(
    edges: EdgeSet,
    x: jax.Array,
    weights: jax.Array,
    *,
    compute_dtype: Optional[jnp.dtype] = None,
    accum_dtype: jnp.dtype = jnp.float32,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Drop-in replacement for :func:`rgcn_tpu.ops.spmm.rel_spmm` using the
    fused Pallas message kernel.

    ``compute_dtype=jnp.bfloat16`` halves gather/message HBM traffic; the
    matmul accumulates in f32 on the MXU and the destination aggregation
    accumulates in ``accum_dtype``.
    """
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        weights = weights.astype(compute_dtype)
    msgs = rel_spmm_messages(
        edges, x, weights, out_dtype=accum_dtype, interpret=interpret
    )
    return aggregate_messages(msgs, edges.dst, edges.num_nodes)


def rel_spmm_pallas_full(
    edges: EdgeSet,
    layout,
    x: jax.Array,
    weights: jax.Array,
    *,
    compute_dtype: Optional[jnp.dtype] = None,
    accum_dtype: jnp.dtype = jnp.float32,
    interpret: Optional[bool] = None,
    input_fusion: bool = False,
) -> jax.Array:
    """Fully Pallas relational SpMM: fused message kernel + MXU one-hot
    destination aggregation (:mod:`rgcn_tpu.ops.pallas_aggregate`), avoiding
    XLA's serializing scatter entirely.

    ``layout`` is the :class:`~rgcn_tpu.ops.pallas_aggregate.DstLayout`
    built once per graph from ``edges.dst``. ``compute_dtype=bfloat16``
    additionally carries the permuted message buffer at half width.
    """
    from rgcn_tpu.ops.pallas_aggregate import aggregate_sorted_pallas

    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        weights = weights.astype(compute_dtype)
    msg_dtype = compute_dtype if compute_dtype is not None else accum_dtype
    msgs = rel_spmm_messages(
        edges, x, weights, out_dtype=msg_dtype, interpret=interpret,
        input_fusion=input_fusion,
    )
    return aggregate_sorted_pallas(
        msgs, layout, edges.num_nodes,
        out_dtype=accum_dtype, interpret=_auto_interpret(interpret),
    )


# ---------------------------------------------------------------------------
# Differentiable wrapper
# ---------------------------------------------------------------------------
#
# pallas_call has no automatic transpose rule, so training needs an explicit
# VJP. Both cotangents are the same class of computation the forward is:
#
#   out[d]   = Σ_{e: dst=d} val_e · x[src_e] · W[rel_e]
#   dx[s]    = Σ_{e: src=s} val_e · g[dst_e] · W[rel_e]ᵀ   (reversed edges)
#   dW[r]    = Σ_{e∈r} val_e · x[src_e]ᵀ ⊗ g[dst_e]        (per-tile outer
#              products reduced over the small sorted tile_rel ids)
#
# The reversed-edge structure (same normalization values, src/dst swapped,
# its own tiling + destination layout) is precomputed by
# ``build_edge_set(..., with_dst_layout=True)`` as ``edges.reverse``.


_FUSED_VMEM_BUDGET = 8 * 1024 * 1024  # resident-weight budget (bytes)


def _fwd_spmm(edges, x, weights):
    """Best available Pallas forward: the single-pass fused kernel when its
    layout exists and the weights fit the VMEM residency budget, else the
    two-stage pipeline."""
    if (
        edges.fused is not None
        and weights.size * weights.dtype.itemsize <= _FUSED_VMEM_BUDGET
    ):
        from rgcn_tpu.ops.pallas_fused import rel_spmm_fused

        return rel_spmm_fused(
            edges.fused, edges.num_nodes, x, weights, compute_dtype=None
        )
    return rel_spmm_pallas_full(edges, edges.layout, x, weights)


@jax.custom_vjp
def _spmm_ad_core(x, weights, edges):
    return _fwd_spmm(edges, x, weights)


def _spmm_ad_fwd(x, weights, edges):
    return _spmm_ad_core(x, weights, edges), (x, weights, edges)


def _spmm_ad_bwd(res, g):
    x, weights, edges = res
    rev = edges.reverse
    g = g.astype(x.dtype)

    w_t = jnp.swapaxes(weights, 1, 2)
    dx = _fwd_spmm(rev, g, w_t).astype(x.dtype)

    tile, nt = edges.tile_size, edges.num_tiles
    xg = x[edges.src].reshape(nt, tile, -1)
    gd = (g[edges.dst] * edges.val[:, None]).reshape(nt, tile, -1)
    partials = jnp.einsum("tbi,tbo->tio", xg, gd)
    dw = jax.ops.segment_sum(
        partials, edges.tile_rel, num_segments=weights.shape[0],
        indices_are_sorted=True,
    ).astype(weights.dtype)
    return dx, dw, None


_spmm_ad_core.defvjp(_spmm_ad_fwd, _spmm_ad_bwd)


def rel_spmm_pallas_ad(edges: EdgeSet, x: jax.Array, weights: jax.Array):
    """Differentiable fully-Pallas relational SpMM.

    Requires ``edges.layout`` and ``edges.reverse`` (built with
    ``build_edge_set(..., with_dst_layout=True)``).
    """
    if edges.layout is None or edges.reverse is None:
        raise ValueError(
            "rel_spmm_pallas_ad needs an EdgeSet built with "
            "with_dst_layout=True (layout + reverse present)"
        )
    return _spmm_ad_core(x, weights, edges)
