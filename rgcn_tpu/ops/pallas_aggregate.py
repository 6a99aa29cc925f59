"""Pallas destination-aggregation kernel (sorted segment-sum on the MXU).

XLA's scatter-add for ``segment_sum`` over row vectors serializes on TPU —
measured ~4.8 ms of a 6.96 ms WN18-scale SpMM step (≈70%). This kernel
replaces it for *destination-sorted* messages:

* Preprocessing lays messages out in destination order, grouped into
  **row blocks** of ``RB`` consecutive destination rows, each block's edges
  padded to a multiple of the chunk size ``CH`` (pad entries carry an
  out-of-range local destination and vanish through the one-hot).
* The kernel grid walks chunks sequentially. The output BlockSpec is
  indexed by the scalar-prefetched row-block id of each chunk: consecutive
  chunks of the same row block accumulate into the same VMEM-resident
  ``(RB, dout)`` block, which is DMA'd back to HBM exactly once when the
  block id advances — every output row is written once, no scatter.
* The in-chunk reduction is a one-hot matmul on the MXU:
  ``onehot(local_dst) (RB, CH) @ msgs (CH, dout)`` — the one-hot never
  exists in HBM (built from a broadcasted iota compare in registers/VMEM).

Traffic: one sequential read of the messages + one write of the output —
the bandwidth floor for this operation.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "DstLayout",
    "build_dst_layout",
    "aggregate_presorted_pallas",
    "aggregate_sorted_pallas",
    "aggregate_messages_ad",
]


@dataclasses.dataclass(frozen=True)
class DstLayout:
    """Destination-sorted chunk layout for aggregation.

    ``perm`` maps layout position → source edge index (gather order), with
    pad positions pointing at a zero-valued edge slot (they additionally
    carry ``local_dst == RB`` so the one-hot drops them).
    """

    perm: np.ndarray  # (L,) int32 — layout position -> edge index
    local_dst: np.ndarray  # (n_chunks, CH) int32 in [0, RB]
    chunk_block: np.ndarray  # (n_chunks,) int32 — row block of each chunk
    num_row_blocks: int
    row_block: int
    chunk: int

    @property
    def num_chunks(self) -> int:
        return self.chunk_block.shape[0]


if "DstLayout" not in getattr(jax.tree_util, "_rgcn_registered", set()):

    def _flatten(dl):
        return (
            (dl.perm, dl.local_dst, dl.chunk_block),
            (dl.num_row_blocks, dl.row_block, dl.chunk),
        )

    def _unflatten(aux, children):
        perm, local_dst, chunk_block = children
        nrb, rb, ch = aux
        return DstLayout(perm, local_dst, chunk_block, nrb, rb, ch)

    jax.tree_util.register_pytree_node(DstLayout, _flatten, _unflatten)
    jax.tree_util._rgcn_registered = {"DstLayout"}


def build_dst_layout(
    dst: np.ndarray,
    num_nodes: int,
    row_block: int = 128,  # swept optimum: one-hot flops scale with rb
    chunk: int = 256,
    pad_to: Optional[int] = None,
    src: Optional[np.ndarray] = None,
    prefer_native: bool = True,
) -> DstLayout:
    """Host-side layout construction for a static graph.

    ``dst`` is the per-edge destination array (any order; pads = num_nodes).
    ``pad_to`` pads the layout to a fixed slot count (appended all-pad
    chunks repeat the last row block — they accumulate zeros): host-built
    per-epoch graphs need shape-stable layouts so the training step
    compiles once (the static bound is
    ``num_row_blocks * chunk + ceil(len(dst) / chunk) * chunk``, the same
    as :func:`rgcn_tpu.graph.dynamic.build_dst_layout_dynamic`).

    ``src``: optional per-edge source array. When given, edges are ordered
    by source WITHIN each destination row block (the kernel's one-hot
    accepts any within-block order) so the consumer's source-row gather
    sees piecewise-ascending indices. Probe facility only — measured
    performance-neutral for the gather and NOT used by production paths
    (``benchmarks/probe_gather2.py``).

    Dispatches to the native counting-sort builder
    (``native/layout_builder.cc``, bit-identical) when the shared library
    is built; pass ``prefer_native=False`` to force NumPy.
    """
    if src is None and prefer_native:
        from rgcn_tpu.graph.native import build_dst_layout_native

        out = build_dst_layout_native(
            np.asarray(dst), num_nodes, row_block, chunk, pad_to
        )
        if out is not None:
            return out
    dst = np.asarray(dst)
    e = dst.shape[0]
    num_row_blocks = -(-num_nodes // row_block)

    # Sort edges by destination row block (secondarily by source when
    # given); drop pad edges (dst == num_nodes) — their val is 0 anyway,
    # but excluding them shrinks the layout.
    if src is not None:
        src = np.asarray(src)
        keep = np.nonzero(dst < num_nodes)[0]
        blk = dst[keep] // row_block
        order = keep[np.lexsort((src[keep], blk))]
        dst_sorted = dst[order]
    else:
        order = np.argsort(dst, kind="stable")
        dst_sorted = dst[order]
        real = dst_sorted < num_nodes
        order, dst_sorted = order[real], dst_sorted[real]

    block_of = dst_sorted // row_block
    counts = np.bincount(block_of, minlength=num_row_blocks)
    # every row block gets >= 1 chunk — an unvisited output block would
    # stay uninitialized in HBM
    padded = np.maximum(-(-counts // chunk), 1) * chunk
    offsets = np.concatenate([[0], np.cumsum(padded)])[:-1]
    starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
    total = int(padded.sum())
    total = max(total, chunk)

    pos = offsets[block_of] + (np.arange(order.shape[0]) - starts[block_of])

    if pad_to is not None:
        if pad_to < total or pad_to % chunk:
            raise ValueError(
                f"pad_to={pad_to} < layout total {total} or not a multiple "
                f"of chunk {chunk}"
            )
        total = pad_to

    perm = np.full(total, e, dtype=np.int32)  # pad -> one-past-end slot
    perm[pos] = order
    local = np.full(total, row_block, dtype=np.int32)  # pad -> RB (dropped)
    local[pos] = dst_sorted - block_of * row_block

    n_chunks = total // chunk
    chunk_starts = np.arange(n_chunks) * chunk
    cum_padded = np.cumsum(padded)
    chunk_block = np.searchsorted(cum_padded, chunk_starts, side="right")
    chunk_block = np.minimum(chunk_block, num_row_blocks - 1).astype(np.int32)

    return DstLayout(
        perm=perm.astype(np.int32),
        local_dst=local.reshape(n_chunks, chunk),
        chunk_block=chunk_block,
        num_row_blocks=int(num_row_blocks),
        row_block=int(row_block),
        chunk=int(chunk),
    )


def _agg_kernel(chunk_block_ref, local_ref, msgs_ref, out_ref):
    """One grid step = one chunk. Output block revisited across the chunk
    run of a row block; zeroed at the run's first chunk."""
    c = pl.program_id(0)

    @pl.when(
        jnp.logical_or(
            c == 0, chunk_block_ref[c] != chunk_block_ref[jnp.maximum(c - 1, 0)]
        )
    )
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    rb = out_ref.shape[0]
    ch = msgs_ref.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (rb, ch), 0)
    onehot = (rows == local_ref[0, 0][None, :]).astype(msgs_ref.dtype)
    out_ref[:] += jnp.dot(
        onehot, msgs_ref[:], preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


def aggregate_presorted_pallas(
    msgs_sorted: jax.Array,
    layout: DstLayout,
    num_nodes: int,
    *,
    out_dtype: jnp.dtype = jnp.float32,
    interpret: Optional[bool] = None,
    input_fusion: bool = False,
) -> jax.Array:
    """Aggregate *already destination-sorted* messages ``(L, dout)``.

    For message computations cheap enough to evaluate per layout slot
    (diag, basis contractions), computing them directly in sorted order
    skips the edge-order materialization + permutation round-trip that
    :func:`aggregate_sorted_pallas` pays.

    ``input_fusion=True`` permits XLA to compute the message producer
    (gathers/elementwise) inside the kernel's input pipeline instead of
    materializing ``(L, dout)`` in HBM (``mosaic.allow_input_fusion``;
    bit-identical on hardware, see
    :func:`rgcn_tpu.ops.pallas_basis.weighted_aggregate_pallas`)."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    dout = msgs_sorted.shape[-1]
    ch = layout.chunk
    rb = layout.row_block
    n_chunks = layout.num_chunks

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec(
                (1, 1, ch), lambda c, cb: (c, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (ch, dout), lambda c, cb: (c, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (rb, dout), lambda c, cb: (cb[c], 0), memory_space=pltpu.VMEM
        ),
    )

    compiler_params = None
    if input_fusion and not interpret:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),  # sequential accumulation
            allow_input_fusion=[False, True],  # [local, msgs]
        )

    out = pl.pallas_call(
        _agg_kernel,
        grid_spec=grid_spec,
        compiler_params=compiler_params,
        out_shape=jax.ShapeDtypeStruct(
            (layout.num_row_blocks * rb, dout), out_dtype
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_chunks * rb * ch * dout,
            bytes_accessed=(
                n_chunks * ch * dout * msgs_sorted.dtype.itemsize
                + layout.num_row_blocks * rb * dout * jnp.dtype(out_dtype).itemsize
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(layout.chunk_block, layout.local_dst.reshape(n_chunks, 1, ch), msgs_sorted)

    return out[:num_nodes]


def aggregate_sorted_pallas(
    messages: jax.Array,
    layout: DstLayout,
    num_nodes: int,
    *,
    out_dtype: jnp.dtype = jnp.float32,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Aggregate per-edge ``messages (E, dout)`` into ``(num_nodes, dout)``.

    ``messages`` are in edge order; the layout's permutation (computed once
    at preprocessing) re-orders them destination-sorted. Pad slots gather
    message row ``E`` — callers must NOT rely on clamping; we append an
    explicit zero row instead.
    """
    dout = messages.shape[-1]
    msgs_z = jnp.concatenate(
        [messages, jnp.zeros((1, dout), messages.dtype)], axis=0
    )
    msgs_sorted = msgs_z[layout.perm]  # (L, dout) destination-sorted
    # NO input_fusion here: fusing this permutation gather MEASURED ~2x
    # SLOWER for the v1/block pipelines (dense-pallas-v1 5.65 ms vs ~2.7,
    # block-expanded likewise — benchmarks/kernels.py, round 3). The
    # producer is a permutation of an already-materialized message tensor;
    # serializing it into the input pipeline loses more overlap than the
    # skipped HBM round trip saves. The basis/diag/decoder paths, whose
    # producers are *source gathers* of small node tables, measure faster
    # fused — fusion stays their default, not this one's.
    return aggregate_presorted_pallas(
        msgs_sorted, layout, num_nodes,
        out_dtype=out_dtype, interpret=interpret,
    )


# ---------------------------------------------------------------------------
# Differentiable wrapper: aggregation is linear, so the VJP of
# ``out[d] = Σ_{e: dst_e = d} messages[e]`` is simply ``g[dst_e]`` — a
# hardware-native gather (pads clamp harmlessly; their cotangent is unused).
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _agg_ad(messages, dst, layout, num_nodes):
    return aggregate_sorted_pallas(messages, layout, num_nodes)


def _agg_ad_fwd(messages, dst, layout, num_nodes):
    # dtype carried as a zero-size array (a bare dtype is not a pytree leaf)
    proto = jnp.zeros((0,), messages.dtype)
    return _agg_ad(messages, dst, layout, num_nodes), (dst, proto)


def _agg_ad_bwd(num_nodes, res, g):
    del num_nodes
    dst, proto = res
    return g[dst].astype(proto.dtype), None, None


_agg_ad.defvjp(_agg_ad_fwd, _agg_ad_bwd)


def aggregate_messages_ad(messages, edges):
    """Differentiable Pallas aggregation over an EdgeSet's dst layout.

    Drop-in for :func:`rgcn_tpu.ops.spmm.aggregate_messages` when
    ``edges.layout`` exists (the gather-based backward works because
    aggregation is a plain segment sum of already-scaled messages).
    """
    if edges.layout is None:
        raise ValueError("EdgeSet has no destination layout")
    return _agg_ad(messages, edges.dst, edges.layout, edges.num_nodes)


# ---------------------------------------------------------------------------
# Composed pair aggregation: the featureless/featureful basis PAIR paths
# compute one message per unique (src, rel) pair (``m``: (U_pad, dout)) and
# fan it out to edges (``m[edge_pair] * val``) before aggregating. The
# fan-out tensor is (E, dout) of narrow rows — materializing it, then
# permuting it destination-sorted, costs two more per-row gather passes
# than the math needs. With a host-composed slot→pair map
# (``graph/structure.py::build_pair_agg``) the aggregation kernel gathers
# straight from the (U_pad, dout) pair table (a ~4x smaller gather table
# at AM scale), and the backward runs as a SECOND presorted aggregation
# over a slots-grouped-by-pair layout — no XLA scatter anywhere.
# ---------------------------------------------------------------------------


# None -> default (OFF: fusing the composed slot->pair gather into the
# kernel input pipeline measured 2631 ms vs 1126.7 unfused on the AM
# forward — interleaved chains, probe_stress_nc --ab; the producer is a
# gather of a small COMPUTED table with duplicated rows, which behaves
# like the round-3 "permutation of a materialized tensor" loser, not the
# "source gather of a small node table" winner). Probes override.
_PAIRS_INPUT_FUSION = None


def _pairs_fusion_default() -> bool:
    if _PAIRS_INPUT_FUSION is not None:
        return _PAIRS_INPUT_FUSION
    return False


# Use the HOST-composed per-slot values (PairAggLayout.slot_val/grad_val)
# when present instead of gathering val_z[perm] / val_z[grad_edge] per
# step — static NC graphs never reweight, and the in-jit gathers are
# (L,)/(Lb,) ≈ 1.6M elements per layer per step at AM scale. Trace-time
# A/B flag (probe variants "_valjit" disable). Correctness contract:
# value-composed arrays freeze a snapshot of val — any runtime
# reweighting MUST drop pairs.agg (PairAggLayout docstring).
_PAIR_STATIC_VAL = True


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def aggregate_pairs_ad(m, val, edge_pair, dst, agg, layout, num_nodes):
    """``out[n] = Σ_{e: dst_e = n} val_e · m[edge_pair_e]`` without ever
    materializing the per-edge fan-out.

    ``agg`` is the EdgeSet's :class:`~rgcn_tpu.graph.structure
    .PairAggLayout`; ``layout`` its forward :class:`DstLayout`. ``val``
    enters in-jit (``val_z[layout.perm]``), so runtime reweighting
    (dropout masks) stays exact — only (src, rel) structure is frozen.
    """
    out, _ = _aggregate_pairs_fwd(
        m, val, edge_pair, dst, agg, layout, num_nodes
    )
    return out


def _aggregate_pairs_fwd(m, val, edge_pair, dst, agg, layout, num_nodes):
    dout = m.shape[-1]
    m_z = jnp.concatenate([m, jnp.zeros((1, dout), m.dtype)], axis=0)
    if _PAIR_STATIC_VAL and agg.slot_val is not None:
        v_slot = agg.slot_val
    else:
        val_z = jnp.concatenate(
            [val, jnp.zeros((1,), val.dtype)], axis=0
        )
        v_slot = val_z[layout.perm]
    msgs_sorted = m_z[agg.slot_pair] * v_slot[:, None]
    out = aggregate_presorted_pallas(
        msgs_sorted, layout, num_nodes,
        input_fusion=_pairs_fusion_default(),
    )
    return out, (m, val, edge_pair, dst, agg)


def _aggregate_pairs_bwd(num_nodes, res, g):
    m, val, edge_pair, dst, agg = res
    dout = g.shape[-1]
    u_pad = m.shape[0]
    g_pad = jnp.concatenate([g, jnp.zeros((1, dout), g.dtype)], axis=0)
    # d_m[u] = Σ_{slots l with slot_pair_l = u} val_l · g[slot_dst_l]:
    # a presorted aggregation over the slots-grouped-by-pair layout, its
    # inputs gathered through the host-composed slot→edge / slot→dst maps
    # (sentinels index the appended zero rows).
    if _PAIR_STATIC_VAL and agg.grad_val is not None:
        v_grad = agg.grad_val
    else:
        val_z = jnp.concatenate(
            [val, jnp.zeros((1,), val.dtype)], axis=0
        )
        v_grad = val_z[agg.grad_edge]
    w_sorted = v_grad[:, None] * g_pad[
        jnp.minimum(agg.grad_dst, num_nodes)
    ]
    d_m = aggregate_presorted_pallas(
        w_sorted, agg.grad_layout, u_pad,
        input_fusion=_pairs_fusion_default(),
    ).astype(m.dtype)
    # d_val is real math (val is graph data, never a parameter; XLA DCEs
    # this when the caller does not differentiate w.r.t. val)
    m_z = jnp.concatenate([m, jnp.zeros((1, dout), m.dtype)], axis=0)
    d_val = jnp.sum(
        m_z[edge_pair] * g_pad[jnp.minimum(dst, num_nodes)], axis=-1
    ).astype(val.dtype)
    return d_m, d_val, None, None, None, None


aggregate_pairs_ad.defvjp(_aggregate_pairs_fwd, _aggregate_pairs_bwd)
