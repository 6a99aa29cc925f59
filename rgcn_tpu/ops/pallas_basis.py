"""Aggregation-first basis-decomposition SpMM (Pallas).

For basis decomposition the relational SpMM factorizes so that the
*aggregation happens before any weight matmul*:

    out[s] = Σ_e val_e · x[src_e] @ (Σ_b comps[rel_e, b] · B_b)
           = Σ_b ( Σ_e (val_e · comps[rel_e, b]) · x[src_e] )[s] @ B_b
             \\_________________ Agg_b ___________________/

(matches the math of ``/root/reference/torch_rgcn/layers.py:242,532-551``
with the basis sum pulled out of the edge sum). Consequences on TPU:

* The edge stage needs **no relation grouping at all** — a plain
  destination-sorted layout (:class:`~rgcn_tpu.ops.pallas_aggregate.DstLayout`)
  with per-edge *scalars* ``w_be = val_e · comps[rel_e, b]``. No relation
  quanta, no per-quantum weight slices, no run padding.
* All matmul FLOPs move into ``nb`` dense ``(N, din) @ (din, dout)``
  products — full-MXU shapes — instead of per-edge small matmuls.
* Weights never need to be VMEM-resident, so the path scales to arbitrary
  relation vocabularies (AM: 266 relations) where the dense fused kernel's
  ``R·din·dout`` VMEM residency breaks.

The kernel is a *weighted* one-hot aggregation: per chunk it builds the
``(RB, CH)`` destination one-hot once, scales it by each basis' per-edge
weight vector, and accumulates ``nb`` MXU matmuls against the gathered
source rows. The backward pass reuses the same kernel over the reversed
edge structure (``sum_bases=True`` mode) — aggregation is linear.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rgcn_tpu.graph.structure import EdgeSet
from rgcn_tpu.ops.pallas_aggregate import DstLayout

__all__ = [
    "weighted_aggregate_pallas",
    "rel_spmm_basis_ad",
    "rel_spmm_basis_merged_ad",
    "rel_spmm_basis_blocks_ad",
    "rel_spmm_featureless_basis_ad",
]


def weighted_aggregate_pallas(
    xg_sorted: jax.Array,  # (L, din) or (nb, L, din) dst-sorted source rows
    weights: jax.Array,  # (nb, L) per-slot scalars (0 on pads)
    layout: DstLayout,
    num_nodes: int,
    *,
    sum_bases: bool = False,
    compute_dtype: Optional[jnp.dtype] = jnp.bfloat16,
    out_dtype: jnp.dtype = jnp.float32,
    interpret: Optional[bool] = None,
    input_fusion: bool = False,
) -> jax.Array:
    """``Agg[b, s] = Σ_{slot: dst=s} weights[b, slot] · xg_sorted[(b,) slot]``.

    Returns ``(nb, num_nodes, din)``, or ``(1, num_nodes, din)`` summed over
    ``b`` when ``sum_bases`` (the backward direction).

    ``out_dtype=bfloat16`` halves the aggregate's HBM write and the
    consumer's read; chunk partials still accumulate in f32 (a VMEM
    scratch), cast only on the closing chunk of each row block.

    ``input_fusion=True`` marks the sorted-rows input as fusible
    (``mosaic.allow_input_fusion``): XLA then computes the producer —
    the source-row GATHER — inside the kernel's input pipeline instead
    of materializing the ``(L, din)`` tensor in HBM first, removing one
    full write+read of the gathered rows.
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    shared_x = xg_sorted.ndim == 2
    nb = weights.shape[0]
    din = xg_sorted.shape[-1]
    ch = layout.chunk
    rb = layout.row_block
    n_chunks = layout.num_chunks
    nx = 1 if shared_x else nb
    n_out = 1 if sum_bases else nb

    if compute_dtype is not None:
        xg_sorted = xg_sorted.astype(compute_dtype)
    xg = xg_sorted.reshape(nx, n_chunks, ch, din)
    w = weights.reshape(nb, n_chunks, 1, ch).transpose(1, 2, 0, 3)
    local = jnp.asarray(layout.local_dst).reshape(n_chunks, 1, ch)

    f32_out = jnp.dtype(out_dtype) == jnp.dtype(jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # chunk_block
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec(
                (1, 1, ch), lambda c, cb: (c, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, nb, ch), lambda c, cb: (c, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (nx, 1, ch, din), lambda c, cb: (0, c, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (n_out, rb, din), lambda c, cb: (0, cb[c], 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=(
            [] if f32_out else [pltpu.VMEM((n_out, rb, din), jnp.float32)]
        ),
    )

    # kernel sees: local (1,1,ch), w (1,1,nb,ch)->[0,b]=w[0,0,b], xg (nx,1,ch,din)
    def kernel(cb_ref, local_ref, w_ref, xg_ref, out_ref, acc=None):
        c = pl.program_id(0)
        tgt = out_ref if f32_out else acc

        @pl.when(
            jnp.logical_or(c == 0, cb_ref[c] != cb_ref[jnp.maximum(c - 1, 0)])
        )
        def _():
            tgt[:] = jnp.zeros_like(tgt)

        rows = jax.lax.broadcasted_iota(jnp.int32, (rb, ch), 0)
        onehot = (rows == local_ref[0, 0][None, :]).astype(xg_ref.dtype)
        for b in range(nb):
            scaled = onehot * w_ref[0, 0, b][None, :].astype(xg_ref.dtype)
            xgb = xg_ref[0 if shared_x else b, 0]
            part = jnp.dot(scaled, xgb, preferred_element_type=jnp.float32)
            if sum_bases:
                tgt[0] += part
            else:
                tgt[b] += part

        if not f32_out:
            # narrow on the row block's closing chunk only
            n = pl.num_programs(0)

            @pl.when(
                jnp.logical_or(
                    c == n - 1, cb_ref[jnp.minimum(c + 1, n - 1)] != cb_ref[c]
                )
            )
            def _():
                out_ref[:] = acc[:].astype(out_ref.dtype)

    compiler_params = None
    if input_fusion and not interpret:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),  # sequential accumulation
            # inputs: [local, w, xg] (the scalar-prefetch arg is separate)
            allow_input_fusion=[False, False, True],
        )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        compiler_params=compiler_params,
        out_shape=jax.ShapeDtypeStruct(
            (n_out, layout.num_row_blocks * rb, din), out_dtype
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * n_chunks * rb * ch * din,
            bytes_accessed=(
                nx * xg_sorted.size // nx * xg_sorted.dtype.itemsize
                + n_out * layout.num_row_blocks * rb * din
                * jnp.dtype(out_dtype).itemsize
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(layout.chunk_block), local, w, xg)

    return out[:, :num_nodes]


def weighted_aggregate_dedup_pallas(
    xg_sorted: jax.Array,  # (Ld, din) dedup'd dst-sorted source rows
    weights_k: jax.Array,  # (K, nb, Ld) per-lane per-slot scalars (0 pads)
    dd,  # rgcn_tpu.graph.coalesce.DedupFwdLayout (geometry + local lanes)
    num_nodes: int,
    *,
    compute_dtype: Optional[jnp.dtype] = jnp.bfloat16,
    out_dtype: jnp.dtype = jnp.float32,
    interpret: Optional[bool] = None,
    input_fusion: bool = False,
) -> jax.Array:
    """K-lane variant of :func:`weighted_aggregate_pallas` for the
    source-dedup'd merged frame: each gather slot carries up to ``K``
    (local destination, weight) contributions — the source row is fetched
    once and fanned out through ``K`` one-hot masks summed before the MXU
    matmul. Same terms as the 1-lane kernel, reassociated.

        Agg[b, d] = Σ_slots Σ_k 1[local_k[k, slot] = d-local] ·
                    weights_k[k, b, slot] · xg_sorted[slot]

    Returns ``(nb, num_nodes, din)``.
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    kk, nb = weights_k.shape[0], weights_k.shape[1]
    din = xg_sorted.shape[-1]
    ch = dd.chunk
    rb = dd.row_block
    n_chunks = dd.num_chunks

    if compute_dtype is not None:
        xg_sorted = xg_sorted.astype(compute_dtype)
    xg = xg_sorted.reshape(1, n_chunks, ch, din)
    w = weights_k.reshape(kk, nb, n_chunks, ch).transpose(2, 0, 1, 3)
    local = jnp.asarray(dd.local_k).transpose(1, 0, 2)  # (n_chunks, K, ch)

    f32_out = jnp.dtype(out_dtype) == jnp.dtype(jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # chunk_block
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec(
                (1, kk, ch), lambda c, cb: (c, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, kk, nb, ch), lambda c, cb: (c, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, ch, din), lambda c, cb: (0, c, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (nb, rb, din), lambda c, cb: (0, cb[c], 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=(
            [] if f32_out else [pltpu.VMEM((nb, rb, din), jnp.float32)]
        ),
    )

    def kernel(cb_ref, local_ref, w_ref, xg_ref, out_ref, acc=None):
        c = pl.program_id(0)
        tgt = out_ref if f32_out else acc

        @pl.when(
            jnp.logical_or(c == 0, cb_ref[c] != cb_ref[jnp.maximum(c - 1, 0)])
        )
        def _():
            tgt[:] = jnp.zeros_like(tgt)

        rows = jax.lax.broadcasted_iota(jnp.int32, (rb, ch), 0)
        dtype = xg_ref.dtype
        # lane one-hots are weight-independent: build once, reuse per basis
        onehots = [
            (rows == local_ref[0, k][None, :]).astype(dtype)
            for k in range(kk)
        ]
        xgb = xg_ref[0, 0]
        for b in range(nb):
            scaled = onehots[0] * w_ref[0, 0, b][None, :].astype(dtype)
            for k in range(1, kk):
                scaled += onehots[k] * w_ref[0, k, b][None, :].astype(dtype)
            tgt[b] += jnp.dot(
                scaled, xgb, preferred_element_type=jnp.float32
            )

        if not f32_out:
            n = pl.num_programs(0)

            @pl.when(
                jnp.logical_or(
                    c == n - 1, cb_ref[jnp.minimum(c + 1, n - 1)] != cb_ref[c]
                )
            )
            def _():
                out_ref[:] = acc[:].astype(out_ref.dtype)

    compiler_params = None
    if input_fusion and not interpret:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            allow_input_fusion=[False, False, True],
        )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        compiler_params=compiler_params,
        out_shape=jax.ShapeDtypeStruct(
            (nb, dd.num_row_blocks * rb, din), out_dtype
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * n_chunks * rb * ch * din,
            bytes_accessed=(
                xg_sorted.size * xg_sorted.dtype.itemsize
                + nb * dd.num_row_blocks * rb * din
                * jnp.dtype(out_dtype).itemsize
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(dd.chunk_block), local, w, xg)

    return out[:, :num_nodes]


def _sorted_inputs(edges: EdgeSet, comps: jax.Array):
    """Destination-sorted per-slot (source index, basis weights)."""
    layout = edges.layout
    perm = jnp.asarray(layout.perm)
    src_z = jnp.concatenate([edges.src, jnp.zeros((1,), edges.src.dtype)])
    wvec = edges.val[:, None] * comps[edges.rel]  # (E_pad, nb)
    wvec_z = jnp.concatenate(
        [wvec, jnp.zeros((1, comps.shape[1]), wvec.dtype)]
    )
    return src_z[perm], wvec_z[perm].T  # (L,), (nb, L)


def _sorted_edge_fields(edges: EdgeSet):
    """Per-slot (dst, rel, val) in the EdgeSet's layout order; pads →
    (0, 0, 0.0)."""
    perm = jnp.asarray(edges.layout.perm)
    dst_z = jnp.concatenate([edges.dst, jnp.zeros((1,), edges.dst.dtype)])
    rel_z = jnp.concatenate([edges.rel, jnp.zeros((1,), edges.rel.dtype)])
    val_z = jnp.concatenate([edges.val, jnp.zeros((1,), edges.val.dtype)])
    # pad slots carry dst == num_nodes in the padded arrays; clip for safe
    # gathers (their val is 0)
    return (
        jnp.clip(dst_z[perm], 0, edges.num_nodes - 1),
        rel_z[perm],
        val_z[perm],
    )


def _basis_fwd_impl(x, params, edges, compute_dtype):
    bases, comps = params
    src_sorted, wvec = _sorted_inputs(edges, comps)
    # cast BEFORE the gather: casting (N, din) once instead of (L, din)
    # after — the gather output feeds the kernel directly, no extra pass.
    # The aggregate materializes in the compute dtype (f32 scratch
    # accumulation in-kernel): measured 1.38 vs 1.43 ms for the f32
    # aggregate at WN18 scale. Folding the basis matmul into the kernel
    # instead (no aggregate in HBM at all) measured WORSE — 1.55 ms, the
    # block-closing matmul breaks the chunk pipeline — and was removed.
    xc = x.astype(compute_dtype) if compute_dtype is not None else x
    xg = xc[src_sorted]  # (L, din) — the one gather
    agg = weighted_aggregate_pallas(
        xg, wvec, edges.layout, edges.num_nodes, compute_dtype=compute_dtype,
        out_dtype=(compute_dtype or jnp.float32), input_fusion=True,
    )  # (nb, N, din)
    out = jnp.einsum("bni,bio->no", agg, bases)
    return out, agg


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _basis_ad_core(x, params, edges, compute_dtype):
    return _basis_fwd_impl(x, params, edges, compute_dtype)[0]


def _basis_ad_fwd(x, params, edges, compute_dtype):
    out, agg = _basis_fwd_impl(x, params, edges, compute_dtype)
    return out, (x, params, edges, agg)


def _basis_ad_bwd(compute_dtype, res, g):
    x, (bases, comps), edges, agg = res
    num_nodes = edges.num_nodes

    # d bases: Agg_b^T @ g
    dbases = jnp.einsum("bni,no->bio", agg, g).astype(bases.dtype)

    # cotangent rows per basis: G_b = g @ B_b^T  (N, din)
    G = jnp.einsum("no,bio->bni", g, bases)  # (nb, N, din)

    # d x: the same weighted aggregation over the reversed edge structure,
    # summed over bases (aggregation is linear in x).
    rev = edges.reverse
    rsrc_sorted, rwvec = _sorted_inputs(rev, comps)
    if compute_dtype is not None:
        G = G.astype(compute_dtype)  # cast before the gather (see fwd)
    Gg = jnp.swapaxes(G, 0, 1)[rsrc_sorted]  # (L', nb, din)
    dx = weighted_aggregate_pallas(
        jnp.swapaxes(Gg, 0, 1), rwvec, rev.layout, num_nodes,
        sum_bases=True, compute_dtype=compute_dtype,
        out_dtype=(compute_dtype or jnp.float32), input_fusion=True,
    )[0]

    # d comps[r, b] = Σ_{e ∈ r} val_e · <x[src_e], G_b[dst_e]>, computed in
    # the REVERSE layout frame so the (L, nb, din) cotangent rows gathered
    # for dx above (Gg: G rows at the reverse slots' sources == the
    # forward edges' destinations) are REUSED — this drops the widest
    # backward gather; only x rows at the reverse slots' receivers (== the
    # forward sources) are fetched fresh.
    xc = x.astype(compute_dtype) if compute_dtype is not None else x
    rdst_s, rrel_s, rval_s = _sorted_edge_fields(rev)
    xr = xc[rdst_s]  # (L', din) — forward sources
    t = jnp.einsum(
        "li,lbi->lb", xr, Gg, preferred_element_type=jnp.float32
    ) * rval_s[:, None]
    dcomps = jax.ops.segment_sum(
        t, rrel_s, num_segments=comps.shape[0]
    ).astype(comps.dtype)

    return dx.astype(x.dtype), (dbases, dcomps), None


_basis_ad_core.defvjp(_basis_ad_fwd, _basis_ad_bwd)


def rel_spmm_basis_ad(edges: EdgeSet, x: jax.Array, bases, comps,
                      compute_dtype=jnp.bfloat16):
    """Differentiable aggregation-first basis SpMM.

    ``bases (nb, din, dout)`` / ``comps (num_rels, nb)`` cover general
    relations only — the self-loop term is the caller's. ``edges`` must
    carry ``layout`` and ``reverse`` (``with_dst_layout=True``). When the
    EdgeSet carries a coalesced-pair layout (``edges.merged``), the merged
    path is used — fewer gather slots, identical math.
    """
    if getattr(edges, "merged", None) is not None:
        return _basis_merged_core(
            x, (bases, comps), edges.merged, compute_dtype, True
        )
    if edges.layout is None or edges.reverse is None:
        raise ValueError(
            "rel_spmm_basis_ad needs an EdgeSet built with "
            "with_dst_layout=True (layout + reverse present)"
        )
    return _basis_ad_core(x, (bases, comps), edges, compute_dtype)


# ---------------------------------------------------------------------------
# Coalesced-pair variant: parallel edges (same (dst, src) pair, different
# relations) merged into single layout slots — the basis weights are scalar
# per slot, so merging just sums them (see rgcn_tpu/graph/coalesce.py; real
# WN18's reciprocal structure makes this ~1.8x fewer slots). The per-slot
# weights stay differentiable w.r.t. comps through the static coefficient
# matrix: wvec = (coeff @ comps)^T, dcomps = coeff^T @ t — small MXU
# matmuls instead of the unmerged path's per-edge gather + segment_sum.
# ---------------------------------------------------------------------------


def _merged_wvec(coeff, comps):
    """(nb, L) per-slot basis weights from the static (L, R') coefficients.

    ``precision='highest'``: TPU XLA runs f32 matmuls one-pass bf16 by
    default, but the unmerged path computes these weights *elementwise*
    at full f32 — the tiny (L, R') x (R', nb) product must not be the one
    place the merged path loses mantissa (caught by the on-hardware
    gradient check in benchmarks/tpu_smoke.py)."""
    return jnp.einsum(
        "lr,rb->bl", jnp.asarray(coeff), comps,
        preferred_element_type=jnp.float32, precision="highest",
    )


def _basis_merged_fwd_impl(x, params, merged, compute_dtype, input_fusion):
    bases, comps = params
    xc = x.astype(compute_dtype) if compute_dtype is not None else x
    dd = getattr(merged, "fwd_dedup", None)
    if dd is not None:
        # source-dedup'd frame: fewer gather slots, K-lane fan-out
        # in-kernel (graph/coalesce.py::DedupFwdLayout); same terms,
        # reassociated — the backward below is untouched (it consumes
        # `agg` and the shared reverse frames only).
        wvec_k = jnp.einsum(
            "klr,rb->kbl", jnp.asarray(dd.coeff_k), comps,
            preferred_element_type=jnp.float32, precision="highest",
        )
        xg = xc[jnp.asarray(dd.src_sorted)]
        agg = weighted_aggregate_dedup_pallas(
            xg, wvec_k, dd, merged.num_nodes,
            compute_dtype=compute_dtype,
            out_dtype=(compute_dtype or jnp.float32),
            input_fusion=input_fusion,
        )  # (nb, N, din)
    else:
        wvec = _merged_wvec(merged.coeff, comps)
        xg = xc[jnp.asarray(merged.src_sorted)]  # (L, din) — the one gather
        agg = weighted_aggregate_pallas(
            xg, wvec, merged.layout, merged.num_nodes,
            compute_dtype=compute_dtype,
            out_dtype=(compute_dtype or jnp.float32),
            input_fusion=input_fusion,
        )  # (nb, N, din)
    out = jnp.einsum("bni,bio->no", agg, bases)
    return out, agg


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _basis_merged_core(x, params, merged, compute_dtype,
                       input_fusion=False):
    return _basis_merged_fwd_impl(
        x, params, merged, compute_dtype, input_fusion
    )[0]


def _basis_merged_fwd(x, params, merged, compute_dtype, input_fusion):
    out, agg = _basis_merged_fwd_impl(
        x, params, merged, compute_dtype, input_fusion
    )
    return out, (x, params, merged, agg)


def _basis_merged_bwd(compute_dtype, input_fusion, res, g):
    x, (bases, comps), merged, agg = res

    dbases = jnp.einsum("bni,no->bio", agg, g).astype(bases.dtype)

    # cotangent rows per basis: G_b = g @ B_b^T  (nb, N, din)
    G = jnp.einsum("no,bio->bni", g, bases)
    if compute_dtype is not None:
        G = G.astype(compute_dtype)

    # dx: weighted aggregation over the reversed pair structure, summed
    # over bases; the reverse slots' sources are the forward receivers.
    rwvec = _merged_wvec(merged.rev_coeff, comps)
    Gg = jnp.swapaxes(G, 0, 1)[jnp.asarray(merged.rev_src_sorted)]  # (L', nb, din)
    dx = weighted_aggregate_pallas(
        jnp.swapaxes(Gg, 0, 1), rwvec, merged.rev_layout, merged.num_nodes,
        sum_bases=True, compute_dtype=compute_dtype,
        out_dtype=(compute_dtype or jnp.float32),
        input_fusion=input_fusion,
    )[0]

    # dcomps[r, b] = Σ_slots coeff[l, r] · <x[receiver_l], G_b[source_l]>,
    # in the REVERSE frame so the Gg rows gathered for dx are reused; only
    # x rows at the reverse receivers (the forward sources) are fetched.
    xc = x.astype(compute_dtype) if compute_dtype is not None else x
    xr = xc[jnp.asarray(merged.rev_receiver)]  # (L', din)
    t = jnp.einsum("li,lbi->lb", xr, Gg, preferred_element_type=jnp.float32)
    dcomps = jnp.einsum(
        "lr,lb->rb", jnp.asarray(merged.rev_coeff), t,
        preferred_element_type=jnp.float32, precision="highest",
    ).astype(comps.dtype)

    return dx.astype(x.dtype), (dbases, dcomps), None


_basis_merged_core.defvjp(_basis_merged_fwd, _basis_merged_bwd)


def rel_spmm_basis_merged_ad(merged, x: jax.Array, bases, comps,
                             compute_dtype=jnp.bfloat16,
                             input_fusion: bool = True):
    """Differentiable aggregation-first basis SpMM over coalesced pairs.

    ``merged`` is a :class:`rgcn_tpu.graph.coalesce.MergedPairLayout` built
    from the same augmented edges an :class:`EdgeSet` would carry; the
    result equals :func:`rel_spmm_basis_ad` on the unmerged edges (same
    math, reassociated sums — allclose at f32, tests/test_coalesce.py).

    ``input_fusion`` fuses the source-row gather into the kernel's input
    pipeline (no HBM materialization of the gathered rows) — see
    :func:`weighted_aggregate_pallas`.
    """
    return _basis_merged_core(
        x, (bases, comps), merged, compute_dtype, input_fusion
    )


# ---------------------------------------------------------------------------
# Featureless basis (NC first layer; AM-class relation vocabularies).
# With identity features, W[r] = Σ_b comps[r, b] · B_b where B_b is (N, dout),
# so  out[s] = Σ_e val_e · W[rel_e][src_e] = Σ_b Σ_e (val_e comps[rel_e, b]) ·
# B_b[src_e]  — the same weighted aggregation, gathering from each basis
# table (shared_x=False) and summing over bases in-kernel. Never expands to
# (R', N, dout) (reference torch_rgcn/layers.py:286-288 materializes the
# stacked form).
# ---------------------------------------------------------------------------


def _fl_basis_fwd_impl(params, edges, compute_dtype):
    bases_rows, comps = params  # (nb, N, dout), (R, nb)
    src_sorted, wvec = _sorted_inputs(edges, comps)
    rows = jnp.swapaxes(bases_rows, 0, 1)  # (N, nb, dout): one gather, all b
    if compute_dtype is not None:
        rows = rows.astype(compute_dtype)
    rg = rows[src_sorted]  # (L, nb, dout)
    out = weighted_aggregate_pallas(
        jnp.swapaxes(rg, 0, 1), wvec, edges.layout, edges.num_nodes,
        sum_bases=True, compute_dtype=compute_dtype,
    )[0]
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _fl_basis_ad_core(params, edges, compute_dtype):
    return _fl_basis_fwd_impl(params, edges, compute_dtype)


def _fl_basis_ad_fwd(params, edges, compute_dtype):
    return _fl_basis_fwd_impl(params, edges, compute_dtype), (params, edges)


def _fl_basis_ad_bwd(compute_dtype, res, g):
    (bases_rows, comps), edges = res
    num_nodes = edges.num_nodes
    nb = comps.shape[1]

    # d bases_rows[b][n] = Σ_{e: src_e = n} val_e comps[rel_e, b] · g[dst_e]:
    # aggregation over the REVERSED structure (receiver = source), one
    # output per basis (sum_bases=False), shared cotangent rows.
    rev = edges.reverse
    rsrc_sorted, rwvec = _sorted_inputs(rev, comps)
    gc = g.astype(compute_dtype) if compute_dtype is not None else g
    gg = gc[rsrc_sorted]  # (L', dout)
    dbases = weighted_aggregate_pallas(
        gg, rwvec, rev.layout, num_nodes, compute_dtype=compute_dtype
    ).astype(bases_rows.dtype)

    # d comps[r, b] = Σ_{e ∈ r} val_e · <B_b[src_e], g[dst_e]>
    rows = jnp.swapaxes(bases_rows, 0, 1)
    if compute_dtype is not None:
        rows = rows.astype(compute_dtype)
    Bs = rows[edges.src]  # (E_pad, nb, dout)
    gd = gc[jnp.clip(edges.dst, 0, num_nodes - 1)]
    t = jnp.einsum(
        "ebo,eo->eb", Bs, gd, preferred_element_type=jnp.float32
    ) * edges.val[:, None]
    dcomps = jax.ops.segment_sum(
        t, edges.rel, num_segments=comps.shape[0]
    ).astype(comps.dtype)

    return (dbases, dcomps), None


_fl_basis_ad_core.defvjp(_fl_basis_ad_fwd, _fl_basis_ad_bwd)


def rel_spmm_featureless_basis_ad(
    edges: EdgeSet, bases_rows: jax.Array, comps: jax.Array,
    compute_dtype=None,
):
    """Differentiable aggregation-first featureless-basis SpMM.

    ``bases_rows (nb, N, dout)`` / ``comps (num_rels, nb)`` — general
    relations only. Requires ``edges.layout`` + ``edges.reverse``.
    """
    if edges.layout is None or edges.reverse is None:
        raise ValueError(
            "rel_spmm_featureless_basis_ad needs an EdgeSet built with "
            "with_dst_layout=True (layout + reverse present)"
        )
    return _fl_basis_ad_core((bases_rows, comps), edges, compute_dtype)


# ---------------------------------------------------------------------------
# Feature-block variant: gather straight from the embedding PARAMETER
# blocks, with the input activation fused into the gathered rows
# (relu(E + b)[src] == relu(E[src] + b) — elementwise ops commute with row
# gathers).
#
# MEASUREMENT HISTORY (v5e, WN18 scale): this path was motivated by an
# apparent ≤128-column input-buffer gather fast path, which long-chain
# timing later DISPROVED — a (N, 128) gather measures ~6.2 ns/row vs
# ~3.5 for the monolithic d=200 gather (benchmarks/probe_gather2.py), and
# every split composition (with/without concat, with/without source-sorted
# layouts or barriers) measures at or below the monolithic op
# (probe_gather3: e-split 1.43-1.48 ms vs e-mono 1.33-1.38 ms). Kept as a
# supported, exactness-tested model option; NOT a perf default.
# ---------------------------------------------------------------------------


def _gather_blocks(blocks, bias, src_sorted, compute_dtype):
    parts = [blk[src_sorted] for blk in blocks]  # fast ≤128-col gathers
    xg = jnp.concatenate(parts, axis=1) + bias
    xg = jax.nn.relu(xg)
    if compute_dtype is not None:
        xg = xg.astype(compute_dtype)
    return xg


def _blocks_fwd_impl(params, edges, compute_dtype):
    blocks, bias, bases, comps = params
    src_sorted, wvec = _sorted_inputs(edges, comps)
    xg = _gather_blocks(blocks, bias, src_sorted, compute_dtype)
    agg = weighted_aggregate_pallas(
        xg, wvec, edges.layout, edges.num_nodes, compute_dtype=compute_dtype
    )
    out = jnp.einsum("bni,bio->no", agg, bases)
    return out, agg


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _basis_blocks_core(params, edges, compute_dtype):
    return _blocks_fwd_impl(params, edges, compute_dtype)[0]


def _basis_blocks_fwd(params, edges, compute_dtype):
    out, agg = _blocks_fwd_impl(params, edges, compute_dtype)
    return out, (params, edges, agg)


def _basis_blocks_bwd(compute_dtype, res, g):
    (blocks, bias, bases, comps), edges, agg = res
    num_nodes = edges.num_nodes

    dbases = jnp.einsum("bni,no->bio", agg, g).astype(bases.dtype)
    G = jnp.einsum("no,bio->bni", g, bases)

    rev = edges.reverse
    rsrc_sorted, rwvec = _sorted_inputs(rev, comps)
    if compute_dtype is not None:
        G = G.astype(compute_dtype)
    Gg = jnp.swapaxes(G, 0, 1)[rsrc_sorted]
    dx_post = weighted_aggregate_pallas(
        jnp.swapaxes(Gg, 0, 1), rwvec, rev.layout, num_nodes,
        sum_bases=True, compute_dtype=compute_dtype,
    )[0]

    # chain through the fused activation: relu mask at node level
    x_pre = jnp.concatenate(blocks, axis=1) + bias
    mask = (x_pre > 0).astype(dx_post.dtype)
    dpre = dx_post * mask
    dbias = jnp.sum(dpre, axis=0, keepdims=True).astype(bias.dtype)
    widths = [b.shape[1] for b in blocks]
    splits = np.cumsum(widths)[:-1]
    dblocks = tuple(
        d.astype(b.dtype)
        for d, b in zip(jnp.split(dpre, splits, axis=1), blocks)
    )

    # d comps in the reverse frame, reusing Gg (see _basis_ad_bwd); the
    # x rows are regathered from the blocks (fast path) post-activation
    rdst_s, rrel_s, rval_s = _sorted_edge_fields(rev)
    xr = _gather_blocks(blocks, bias, rdst_s, compute_dtype)
    t = jnp.einsum(
        "li,lbi->lb", xr, Gg, preferred_element_type=jnp.float32
    ) * rval_s[:, None]
    dcomps = jax.ops.segment_sum(
        t, rrel_s, num_segments=comps.shape[0]
    ).astype(comps.dtype)

    return (dblocks, dbias, dbases, dcomps), None


_basis_blocks_core.defvjp(_basis_blocks_fwd, _basis_blocks_bwd)


def rel_spmm_basis_blocks_ad(
    edges: EdgeSet,
    x_blocks,
    bias: jax.Array,
    bases: jax.Array,
    comps: jax.Array,
    compute_dtype=jnp.bfloat16,
):
    """Aggregation-first basis SpMM gathering from ≤128-column embedding
    parameter blocks with the input activation fused (relu(E + b)[src]).

    ``x_blocks``: tuple of ``(N, w_i)`` parameter arrays, Σw_i = din;
    ``bias``: ``(1, din)``. Returns the aggregated general-relation term
    (the caller applies the self-loop path to the full activations).
    """
    if edges.layout is None or edges.reverse is None:
        raise ValueError(
            "rel_spmm_basis_blocks_ad needs an EdgeSet built with "
            "with_dst_layout=True (layout + reverse present)"
        )
    return _basis_blocks_core(
        (tuple(x_blocks), bias, bases, comps), edges, compute_dtype
    )
