"""Permute-free diagonal-weight SpMM (e-RGCN first layer).

Diagonal messages (``x[src] ⊙ dw[rel] · val``, reference
``torch_rgcn/layers.py:289-292``) are cheap enough to evaluate *directly in
destination-sorted slot order*: XLA fuses the two gathers and the products
into the message write, which then feeds the Pallas one-hot aggregation
without the edge-order materialization + permutation round-trip the generic
path pays (two extra HBM passes over an ``(L, d)`` tensor).

Backward: aggregation and the diagonal product are linear —

* ``dx``   = the same permute-free pipeline over the reversed edge
  structure (cotangent rows in place of features);
* ``d dw`` = per-relation ``Σ_e val_e · x[src_e] ⊙ g[dst_e]`` — a fused
  elementwise product + relation ``segment_sum`` in edge order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from rgcn_tpu.graph.structure import EdgeSet
from rgcn_tpu.ops.pallas_aggregate import aggregate_presorted_pallas

__all__ = ["rel_spmm_diag_ad"]


def _slot_arrays(edges: EdgeSet):
    """Destination-sorted per-slot (src, rel, val); pads → (0, 0, 0.0)."""
    perm = jnp.asarray(edges.layout.perm)
    src_z = jnp.concatenate([edges.src, jnp.zeros((1,), edges.src.dtype)])
    rel_z = jnp.concatenate([edges.rel, jnp.zeros((1,), edges.rel.dtype)])
    val_z = jnp.concatenate([edges.val, jnp.zeros((1,), edges.val.dtype)])
    return src_z[perm], rel_z[perm], val_z[perm]


# Row gathers on TPU are row-latency-bound (~ns/row regardless of width),
# so looking the per-slot weight vector up via a one-hot matmul on the MXU
# beats gathering it when the onehot stays modest. Cap the materialized
# (L, R) one-hot at ~256 MB.
_ONEHOT_LOOKUP_MAX_ELEMS = 64_000_000


def _lookup_rows(table, idx):
    """``table[idx]`` — as ``onehot(idx) @ table`` for small tables."""
    n_rows = table.shape[0]
    if idx.shape[0] * n_rows <= _ONEHOT_LOOKUP_MAX_ELEMS:
        oh = (
            idx[:, None] == jnp.arange(n_rows, dtype=idx.dtype)[None, :]
        ).astype(table.dtype)
        return oh @ table
    return table[idx]


def _diag_sorted_agg(x, dw, edges, compute_dtype):
    src_s, rel_s, val_s = _slot_arrays(edges)
    # cast the (N, d) operands BEFORE the gather/lookup: the (L, d)
    # message tensor then materializes at half width — the dominant HBM
    # traffic of this op after the (latency-bound) gather itself
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        dw = dw.astype(compute_dtype)
        val_s = val_s.astype(compute_dtype)
    msgs = x[src_s] * _lookup_rows(dw, rel_s) * val_s[:, None]
    # input_fusion: gather + products compute in the kernel's input
    # pipeline — the (L, d) message tensor never lands in HBM
    return aggregate_presorted_pallas(
        msgs, edges.layout, edges.num_nodes, input_fusion=True
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _diag_ad_core(x, dw, edges, compute_dtype):
    return _diag_sorted_agg(x, dw, edges, compute_dtype)


def _diag_ad_fwd(x, dw, edges, compute_dtype):
    return _diag_ad_core(x, dw, edges, compute_dtype), (x, dw, edges)


def _diag_ad_bwd(compute_dtype, res, g):
    x, dw, edges = res
    g = g.astype(x.dtype)

    dx = _diag_sorted_agg(g, dw, edges.reverse, compute_dtype).astype(x.dtype)

    xc = x.astype(compute_dtype) if compute_dtype is not None else x
    gc = g.astype(compute_dtype) if compute_dtype is not None else g
    t = xc[edges.src] * (gc[jnp.clip(edges.dst, 0, edges.num_nodes - 1)]
                         * edges.val[:, None].astype(xc.dtype))
    ddw = jax.ops.segment_sum(
        t.astype(jnp.float32), edges.rel, num_segments=dw.shape[0]
    ).astype(dw.dtype)
    return dx, ddw, None


_diag_ad_core.defvjp(_diag_ad_fwd, _diag_ad_bwd)


# ---------------------------------------------------------------------------
# Coalesced-pair variant (e-RGCN over reciprocal graphs): the per-slot
# weight becomes a *vector* ``dvec_l = Σ_{e on pair} val_e · dw[rel_e]`` —
# computed as one small MXU matmul ``coeff @ dw`` from the static per-slot
# relation coefficients (rgcn_tpu/graph/coalesce.py), so parallel edges
# cost one gather slot instead of one each. Same exact-reassociation
# contract as the merged basis path.
# ---------------------------------------------------------------------------


def _merged_dvec(coeff, dw):
    # precision='highest': the unmerged path applies dw elementwise at full
    # f32; this tiny (L, R') x (R', d) product must not round to bf16
    return jnp.einsum(
        "lr,rd->ld", jnp.asarray(coeff), dw,
        preferred_element_type=jnp.float32, precision="highest",
    )


def _diag_merged_agg(rows, dvec, layout, num_nodes, compute_dtype):
    if compute_dtype is not None:
        rows = rows.astype(compute_dtype)
        dvec = dvec.astype(compute_dtype)
    # input_fusion: the gather + elementwise product compute inside the
    # kernel's input pipeline — no (L, d) message tensor in HBM
    return aggregate_presorted_pallas(
        rows * dvec, layout, num_nodes, input_fusion=True
    )


def _diag_merged_impl(x, dw, merged, compute_dtype):
    xc = x.astype(compute_dtype) if compute_dtype is not None else x
    xg = xc[jnp.asarray(merged.src_sorted)]  # (L, d)
    return _diag_merged_agg(
        xg, _merged_dvec(merged.coeff, dw), merged.layout,
        merged.num_nodes, compute_dtype,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _diag_merged_core(x, dw, merged, compute_dtype):
    return _diag_merged_impl(x, dw, merged, compute_dtype)


def _diag_merged_fwd(x, dw, merged, compute_dtype):
    return _diag_merged_impl(x, dw, merged, compute_dtype), (x, dw, merged)


def _diag_merged_bwd(compute_dtype, res, g):
    x, dw, merged = res
    g = g.astype(x.dtype)
    gc = g.astype(compute_dtype) if compute_dtype is not None else g

    # dx: same pipeline over the reversed pair frame; the cotangent rows
    # gathered here are REUSED for d dw below.
    gg = gc[jnp.asarray(merged.rev_src_sorted)]  # (L', d)
    dx = _diag_merged_agg(
        gg, _merged_dvec(merged.rev_coeff, dw), merged.rev_layout,
        merged.num_nodes, compute_dtype,
    ).astype(x.dtype)

    # d dw[r, k] = Σ_slots coeff[l, r] · x[receiver_l, k] · g[source_l, k]
    xc = x.astype(compute_dtype) if compute_dtype is not None else x
    xr = xc[jnp.asarray(merged.rev_receiver)]  # (L', d)
    t = (xr * gg).astype(jnp.float32)
    ddw = jnp.einsum(
        "lr,ld->rd", jnp.asarray(merged.rev_coeff), t,
        preferred_element_type=jnp.float32, precision="highest",
    ).astype(dw.dtype)
    return dx, ddw, None


_diag_merged_core.defvjp(_diag_merged_fwd, _diag_merged_bwd)


def rel_spmm_diag_ad(
    edges: EdgeSet,
    x: jax.Array,
    diag_weights: jax.Array,
    compute_dtype=None,
):
    """Differentiable permute-free diagonal relational SpMM.

    Requires ``edges.layout`` and ``edges.reverse``
    (``with_dst_layout=True``). When the EdgeSet carries a coalesced-pair
    layout (``edges.merged``), the merged path is used — fewer gather
    slots, identical math.
    """
    if getattr(edges, "merged", None) is not None:
        return _diag_merged_core(
            x, diag_weights, edges.merged, compute_dtype
        )
    if edges.layout is None or edges.reverse is None:
        raise ValueError(
            "rel_spmm_diag_ad needs an EdgeSet built with "
            "with_dst_layout=True (layout + reverse present)"
        )
    return _diag_ad_core(x, diag_weights, edges, compute_dtype)
