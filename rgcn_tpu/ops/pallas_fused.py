"""Single-pass fused relational SpMM kernel (v2).

The v1 pipeline (:mod:`rgcn_tpu.ops.pallas_spmm` +
:mod:`rgcn_tpu.ops.pallas_aggregate`) materializes messages twice: once in
relation order (for relation-blocked matmuls) and once permuted into
destination order (for scatter-free aggregation). The permute alone measures
~0.84 ms of a 2.66 ms WN18-scale op.

This kernel removes both materializations for graphs whose full weight
tensor fits VMEM (``R·din·dout·2B ≲ 4 MB`` — true for WN18/FB-toy-class
relation vocabularies):

* Edges are laid out by ``(destination row-block, relation)``: each
  row-block's edges are padded to a multiple of the chunk size ``CH``, and
  within a chunk each ``Q``-row *quantum* has a single relation
  (runs padded to quantum multiples).
* The kernel keeps the whole ``W`` in VMEM. Per chunk it computes messages
  quantum-by-quantum (``(Q, din) @ W[rel_q]`` — ``rel_q`` is a
  scalar-prefetched per-quantum id, the weight a dynamic VMEM slice), scales
  by the normalization value, assembles them in a VMEM scratch, then
  accumulates into the destination row-block with one one-hot MXU matmul.
* Output blocks follow the v1 revisit pattern: consecutive chunks of a row
  block accumulate in VMEM; each output row is written to HBM once.

HBM traffic: one gather of the (already fused-ordered) source features + one
output write — the floor for this operation.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rgcn_tpu.graph.structure import EdgeSet

__all__ = [
    "FusedLayout",
    "build_fused_layout",
    "build_fused_layout_dynamic",
    "rel_spmm_fused",
]


@dataclasses.dataclass(frozen=True)
class FusedLayout:
    """Destination-major, relation-quantum edge layout."""

    src: np.ndarray  # (L,) int32 — source node per fused slot (pads: 0)
    val: np.ndarray  # (L,) float32 — normalization (pads: 0)
    local_dst: np.ndarray  # (n_chunks, CH) int32 in [0, RB]; pads = RB
    quantum_rel: np.ndarray  # (n_quanta,) int32
    chunk_block: np.ndarray  # (n_chunks,) int32
    num_row_blocks: int
    row_block: int
    chunk: int
    quantum: int

    @property
    def num_chunks(self) -> int:
        return self.chunk_block.shape[0]


def _register():
    def flat(fl):
        return (
            (fl.src, fl.val, fl.local_dst, fl.quantum_rel, fl.chunk_block),
            (fl.num_row_blocks, fl.row_block, fl.chunk, fl.quantum),
        )

    def unflat(aux, ch):
        return FusedLayout(*ch, *aux)

    jax.tree_util.register_pytree_node(FusedLayout, flat, unflat)


_register()


def build_fused_layout(
    edges: EdgeSet,
    row_block: int = 512,
    chunk: int = 512,
    quantum: int = 64,
) -> FusedLayout:
    """Host-side fused layout from a (host-array) EdgeSet."""
    src = np.asarray(edges.src)
    dst = np.asarray(edges.dst)
    rel = np.asarray(edges.rel)
    val = np.asarray(edges.val)
    n = edges.num_nodes
    num_row_blocks = -(-n // row_block)
    qpc = chunk // quantum
    if chunk % quantum:
        raise ValueError("chunk must be a multiple of quantum")

    real = val > 0
    src, dst, rel, val = src[real], dst[real], rel[real], val[real]
    rb = dst // row_block

    # sort by (row_block, rel) — runs = (rb, rel) groups
    order = np.lexsort((rel, rb))
    src, dst, rel, val, rb = (
        src[order], dst[order], rel[order], val[order], rb[order],
    )

    # run boundaries -> quantum-padded positions
    key = rb.astype(np.int64) * (edges.num_rels + 1) + rel
    new_run = np.concatenate([[True], key[1:] != key[:-1]])
    run_id = np.cumsum(new_run) - 1
    n_runs = int(run_id[-1]) + 1 if len(run_id) else 0
    run_len = np.bincount(run_id, minlength=n_runs)
    run_rel = rel[new_run]
    run_rb = rb[new_run]
    run_pad = -(-run_len // quantum) * quantum

    # row-block totals (in padded-run space), then chunk-pad each block
    blk_tot = np.zeros(num_row_blocks, dtype=np.int64)
    np.add.at(blk_tot, run_rb, run_pad)
    blk_pad = np.maximum(-(-blk_tot // chunk), 1) * chunk
    blk_off = np.concatenate([[0], np.cumsum(blk_pad)])[:-1]

    # run offsets within blocks
    run_off = np.zeros(n_runs, dtype=np.int64)
    cursor = blk_off.copy()
    for i in range(n_runs):
        run_off[i] = cursor[run_rb[i]]
        cursor[run_rb[i]] += run_pad[i]

    total = int(blk_pad.sum())
    total = max(total, chunk)
    pos = run_off[run_id] + (
        np.arange(len(src)) - np.concatenate([[0], np.cumsum(run_len)])[:-1][run_id]
    )

    src_f = np.zeros(total, dtype=np.int32)
    val_f = np.zeros(total, dtype=np.float32)
    local = np.full(total, row_block, dtype=np.int32)
    src_f[pos] = src
    val_f[pos] = val
    local[pos] = (dst - rb * row_block).astype(np.int32)

    # per-quantum relation: scatter run rel over its quanta; quanta outside
    # every run (block chunk-rounding gaps) get -1 — the kernel skips their
    # message matmuls entirely (their slots carry local_dst == row_block,
    # dropped by the one-hot regardless)
    n_quanta = total // quantum
    qrel = np.full(n_quanta, -1, dtype=np.int32)
    for i in range(n_runs):
        q0 = run_off[i] // quantum
        qn = run_pad[i] // quantum
        qrel[q0 : q0 + qn] = run_rel[i]

    n_chunks = total // chunk
    chunk_starts = np.arange(n_chunks, dtype=np.int64) * chunk
    cumblk = np.cumsum(blk_pad)
    chunk_block = np.searchsorted(cumblk, chunk_starts, side="right")
    chunk_block = np.minimum(chunk_block, num_row_blocks - 1).astype(np.int32)

    return FusedLayout(
        src=src_f,
        val=val_f,
        local_dst=local.reshape(n_chunks, chunk),
        quantum_rel=qrel,
        chunk_block=chunk_block,
        num_row_blocks=int(num_row_blocks),
        row_block=int(row_block),
        chunk=int(chunk),
        quantum=int(quantum),
    )


def build_fused_layout_dynamic(
    edges: EdgeSet,
    row_block: int = 512,
    chunk: int = 512,
    quantum: int = 16,
) -> FusedLayout:
    """In-jit (traceable) fused-layout construction for per-step graphs.

    Same contract as :func:`build_fused_layout`, expressed as fixed-shape
    JAX ops (sort, run-length detection, segment reductions, scatters).
    Static sizes derive from bounds: runs ≤ min(E_pad, row_blocks · R);
    total ≤ E_pad + runs·(Q-1) rounded into chunk-padded row blocks.
    """
    import jax

    src = edges.src
    dst = edges.dst
    rel = edges.rel
    val = edges.val
    n = edges.num_nodes
    num_general = edges.num_rels
    e_pad = src.shape[0]
    num_row_blocks = -(-n // row_block)
    qpc = chunk // quantum
    if chunk % quantum:
        raise ValueError("chunk must be a multiple of quantum")
    del qpc

    b_runs = min(e_pad, num_row_blocks * num_general)
    total = (
        e_pad
        + b_runs * (quantum - 1)
        + num_row_blocks * chunk  # per-block chunk rounding + min-1-chunk
    )
    total = -(-total // chunk) * chunk
    n_chunks = total // chunk
    n_quanta = total // quantum

    real = val > 0
    rb_of = jnp.minimum(dst // row_block, num_row_blocks - 1)
    # (rb, rel) key fits int32 comfortably (row_blocks * relations)
    big = jnp.int32(num_row_blocks * (num_general + 1) + num_general)
    key = jnp.where(
        real,
        rb_of.astype(jnp.int32) * (num_general + 1) + rel,
        big,
    )
    order = jnp.argsort(key)
    key_s = key[order]
    src_s, dst_s = src[order], dst[order]
    val_s, real_s = val[order], real[order]
    rb_s = rb_of[order]
    rel_s = rel[order]

    pos_idx = jnp.arange(e_pad, dtype=jnp.int32)
    is_new = jnp.concatenate(
        [jnp.ones((1,), jnp.int32),
         (key_s[1:] != key_s[:-1]).astype(jnp.int32)]
    )
    run_id = jnp.minimum(jnp.cumsum(is_new) - 1, b_runs - 1)

    real_i = real_s.astype(jnp.int32)
    run_len = jax.ops.segment_sum(real_i, run_id, num_segments=b_runs)
    neg = jnp.full((e_pad,), -1, jnp.int32)
    run_rel = jax.ops.segment_max(
        jnp.where(real_s, rel_s, neg), run_id, num_segments=b_runs
    )
    run_rel = jnp.clip(run_rel, 0, num_general - 1)
    run_rb = jax.ops.segment_max(
        jnp.where(real_s, rb_s.astype(jnp.int32), neg), run_id,
        num_segments=b_runs,
    )
    run_rb = jnp.clip(run_rb, 0, num_row_blocks - 1)
    run_pad = -(-run_len // quantum) * quantum

    blk_tot = jax.ops.segment_sum(run_pad, run_rb, num_segments=num_row_blocks)
    blk_pad = jnp.maximum(-(-blk_tot // chunk), 1) * chunk
    cum_blk = jnp.cumsum(blk_pad)
    blk_off = cum_blk - blk_pad

    cum_run = jnp.cumsum(run_pad) - run_pad  # exclusive, in run order
    blk_first_cum = jax.ops.segment_min(
        jnp.where(run_len > 0, cum_run, jnp.iinfo(jnp.int32).max),
        run_rb, num_segments=num_row_blocks,
    )
    blk_first_cum = jnp.where(
        blk_tot > 0, blk_first_cum, 0
    )
    run_off = blk_off[run_rb] + (cum_run - blk_first_cum[run_rb])
    # tail runs with no edges must not break run_off monotonicity for the
    # quantum searchsorted below
    run_off = jnp.where(run_len > 0, run_off, total + 1)

    run_start = jax.ops.segment_min(
        jnp.where(real_s, pos_idx, e_pad), run_id, num_segments=b_runs
    )
    rank = pos_idx - run_start[run_id]
    pos = jnp.where(real_s, run_off[run_id] + rank, total)

    src_f = jnp.zeros((total,), jnp.int32).at[pos].set(src_s, mode="drop")
    val_f = jnp.zeros((total,), jnp.float32).at[pos].set(val_s, mode="drop")
    local = jnp.full((total,), row_block, jnp.int32).at[pos].set(
        (dst_s - rb_s * row_block).astype(jnp.int32), mode="drop"
    )

    # per-quantum relation: the run whose [run_off, run_off + run_pad) span
    # covers the quantum start; gap quanta (between a block's runs and its
    # chunk padding) get -1 so the kernel skips their message matmuls (the
    # one-hot drops their slots regardless).
    q_starts = jnp.arange(n_quanta, dtype=jnp.int32) * quantum
    q_run = jnp.clip(
        jnp.searchsorted(run_off, q_starts, side="right") - 1, 0, b_runs - 1
    )
    q_in_run = (run_len[q_run] > 0) & (
        q_starts < run_off[q_run] + run_pad[q_run]
    )
    qrel = jnp.where(q_in_run, run_rel[q_run], -1)

    chunk_starts = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    chunk_block = jnp.searchsorted(cum_blk, chunk_starts, side="right")
    chunk_block = jnp.minimum(chunk_block, num_row_blocks - 1).astype(jnp.int32)

    return FusedLayout(
        src=src_f,
        val=val_f,
        local_dst=local.reshape(n_chunks, chunk),
        quantum_rel=qrel.astype(jnp.int32),
        chunk_block=chunk_block,
        num_row_blocks=int(num_row_blocks),
        row_block=int(row_block),
        chunk=int(chunk),
        quantum=int(quantum),
    )


def _make_fused_kernel(quantum: int):
    def kernel(qrel_ref, cb_ref, local_ref, xg_ref, val_ref, w_ref,
               out_ref, msgs_ref):
        c = pl.program_id(0)

        @pl.when(
            jnp.logical_or(
                c == 0, cb_ref[c] != cb_ref[jnp.maximum(c - 1, 0)]
            )
        )
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        ch = xg_ref.shape[1]
        qpc = ch // quantum
        # messages per quantum: dynamic VMEM slice of the resident weights.
        # Gap quanta carry relation -1 in the layout (clamped to 0 here);
        # their slots have val == 0, so their messages are zero. Computing
        # them unconditionally is FASTER than pl.when-predicating per
        # quantum — branchy per-quantum control flow was measured ~1.5x
        # slower (it breaks Mosaic's software pipelining of the unrolled
        # matmul sequence).
        for qi in range(qpc):  # static unroll
            rel_q = jnp.maximum(qrel_ref[c * qpc + qi], 0)
            w_q = w_ref[rel_q]  # (din, dout) dynamic slice of VMEM block
            xq = xg_ref[0, qi * quantum : (qi + 1) * quantum, :]
            m = jnp.dot(xq, w_q, preferred_element_type=jnp.float32)
            m = m * val_ref[0, 0, qi * quantum : (qi + 1) * quantum][:, None]
            msgs_ref[qi * quantum : (qi + 1) * quantum, :] = m.astype(
                msgs_ref.dtype
            )

        rb = out_ref.shape[0]
        rows = jax.lax.broadcasted_iota(jnp.int32, (rb, ch), 0)
        onehot = (rows == local_ref[0, 0][None, :]).astype(msgs_ref.dtype)
        out_ref[:] += jnp.dot(
            onehot, msgs_ref[:], preferred_element_type=jnp.float32
        ).astype(out_ref.dtype)

    return kernel


def rel_spmm_fused(
    layout: FusedLayout,
    num_nodes: int,
    x: jax.Array,
    weights: jax.Array,
    *,
    compute_dtype: Optional[jnp.dtype] = jnp.bfloat16,
    interpret: Optional[bool] = None,
    input_fusion: bool = True,
) -> jax.Array:
    """Forward relational SpMM via the fused kernel.

    ``weights`` (num_rels, din, dout) must fit VMEM in ``compute_dtype``.

    ``input_fusion`` (default on): XLA computes the source gather inside
    the kernel's input pipeline (``mosaic.allow_input_fusion``) — same
    source-gather fusion as the basis path; measured 2.09 -> 1.82 ms
    same-process at WN18 scale (``benchmarks/kernels.py``).
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        weights = weights.astype(compute_dtype)

    ch = layout.chunk
    rb = layout.row_block
    n_chunks = layout.num_chunks
    din = x.shape[-1]
    dout = weights.shape[-1]

    xg = x[layout.src].reshape(n_chunks, ch, din)
    val = jnp.asarray(layout.val).reshape(n_chunks, 1, ch)
    local = jnp.asarray(layout.local_dst).reshape(n_chunks, 1, ch)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # quantum_rel, chunk_block
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec(
                (1, 1, ch), lambda c, qr, cb: (c, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, ch, din), lambda c, qr, cb: (c, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, ch), lambda c, qr, cb: (c, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(  # full weights, resident (constant index)
                weights.shape, lambda c, qr, cb: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (rb, dout), lambda c, qr, cb: (cb[c], 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((ch, dout), compute_dtype or jnp.float32),
        ],
    )

    compiler_params = None
    if input_fusion and not interpret:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # inputs after the 2 scalar-prefetch args: [local, xg, val, w]
            allow_input_fusion=[False, True, False, False],
        )

    out = pl.pallas_call(
        _make_fused_kernel(layout.quantum),
        grid_spec=grid_spec,
        compiler_params=compiler_params,
        out_shape=jax.ShapeDtypeStruct(
            (layout.num_row_blocks * rb, dout), jnp.float32
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_chunks * ch * din * dout
            + 2 * n_chunks * rb * ch * dout,
            bytes_accessed=(
                xg.size * xg.dtype.itemsize
                + weights.size * weights.dtype.itemsize
                + layout.num_row_blocks * rb * dout * 4
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(layout.quantum_rel, layout.chunk_block, local, xg, val, weights)

    return out[:num_nodes]
