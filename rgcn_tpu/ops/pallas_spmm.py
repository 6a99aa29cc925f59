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

__all__ = ["rel_spmm_messages", "rel_spmm_pallas"]


def _msgs_kernel(tile_rel_ref, xg_ref, w_ref, val_ref, out_ref):
    """One grid step = one relation-uniform tile of edges.

    xg_ref: (1, T, din) gathered source features
    w_ref:  (1, din, dout) — weight of this tile's relation (auto-DMA'd only
            when the prefetched tile_rel changes between grid steps)
    val_ref: (1, T) per-edge normalization (0 for pads/dropped edges)
    out_ref: (1, T, dout)
    """
    del tile_rel_ref  # only used by the index maps
    msgs = jnp.dot(
        xg_ref[0], w_ref[0], preferred_element_type=jnp.float32
    )
    out_ref[0] = (msgs * val_ref[0][:, None]).astype(out_ref.dtype)


def rel_spmm_messages(
    edges: EdgeSet,
    x: jax.Array,
    weights: jax.Array,
    *,
    out_dtype: Optional[jnp.dtype] = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused (gathered-features × per-relation weight × normalization).

    Args:
      edges: relation-sorted tile-padded edge set.
      x: node features ``(N, din)``; the source gather itself stays in XLA
         (a hardware-native dynamic-gather).
      weights: ``(num_rels, din, dout)`` general-relation weights.

    Returns messages ``(E_pad, dout)`` ready for destination aggregation.
    """
    tile = edges.tile_size
    n_tiles = edges.num_tiles
    din = x.shape[-1]
    dout = weights.shape[-1]
    out_dtype = out_dtype or weights.dtype

    xg = x[edges.src].reshape(n_tiles, tile, din)
    val = edges.val.reshape(n_tiles, tile)

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
                (1, tile), lambda i, tr: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tile, dout), lambda i, tr: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )

    msgs = pl.pallas_call(
        _msgs_kernel,
        grid_spec=grid_spec,
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
    interpret: bool = False,
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
