"""Device mesh construction and edge-partitioned sharding.

Scaling model (new capability — the reference is strictly single-device,
``/root/reference/experiments/classify_nodes.py:46-47``): the relation-sorted
edge tiles of an :class:`EdgeSet` are partitioned across a 1-D ``edge`` mesh
axis. Each chip aggregates its local edges into partial node sums; one
``psum`` over ICI (inserted inside :class:`~rgcn_tpu.nn.layers.RGCNConv` via
``axis_name``) reduces the partials. Node features and weights are
replicated — they are orders of magnitude smaller than the edge list for the
graphs this framework targets. The decoder batch is sharded over the same
axis (data parallelism for scoring).

All communication is XLA collectives through ``shard_map`` — no hand-rolled
transport.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rgcn_tpu.graph.structure import EdgeSet

__all__ = [
    "EDGE_AXIS",
    "make_mesh",
    "shard_edge_set",
    "prepare_sharded_layouts",
    "prepare_sharded_pairs_host",
]

EDGE_AXIS = "edge"


def make_mesh(
    num_devices: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_name: str = EDGE_AXIS,
) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        if len(devices) < num_devices:
            raise ValueError(
                f"requested {num_devices} devices, have {len(devices)}"
            )
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def shard_edge_set(edges: EdgeSet, mesh: Mesh, axis_name: str = EDGE_AXIS) -> EdgeSet:
    """Place an EdgeSet with tiles distributed across the mesh axis.

    ``edges.num_tiles`` must be divisible by the axis size — build with
    ``tile_multiple=mesh.shape[axis_name]``.
    """
    n_shards = mesh.shape[axis_name]
    if edges.num_tiles % n_shards:
        raise ValueError(
            f"num_tiles ({edges.num_tiles}) not divisible by mesh axis "
            f"{axis_name!r} ({n_shards}); build the EdgeSet with "
            f"tile_multiple={n_shards}"
        )
    edge_sharding = NamedSharding(mesh, P(axis_name))

    def put(x):
        return jax.device_put(x, edge_sharding)

    return EdgeSet(
        src=put(edges.src),
        dst=put(edges.dst),
        rel=put(edges.rel),
        val=put(edges.val),
        tile_rel=put(edges.tile_rel),
        num_nodes=edges.num_nodes,
        num_rels=edges.num_rels,
        tile_size=edges.tile_size,
        num_edges=edges.num_edges,
    )


def prepare_sharded_layouts(
    edges: EdgeSet,
    mesh: Mesh,
    axis_name: str = EDGE_AXIS,
    row_block: int = 256,
) -> EdgeSet:
    """Attach per-shard Pallas destination layouts to a sharded EdgeSet.

    Each device builds the layout + reversed structure for its *local* edge
    slice (the in-jit builders from :mod:`rgcn_tpu.graph.dynamic`, uniform
    static shapes across shards), so the sharded training steps can run the
    Pallas SpMM per shard before the cross-shard ``psum``. Runs once per
    graph; outputs stay sharded along the mesh axis.

    Note: pallas_call under shard_map requires ``check_vma=False`` (no vma
    metadata on kernel outputs; interpret mode additionally rejects mixed
    varying/invariant operands inside kernels). Differentiated shard_maps
    — including sharded *training* through the Pallas kernels — are made
    exact without vma tracking by the manual-AD collectives in
    :mod:`rgcn_tpu.ops.collectives` (``all_reduce``/``fanout``); see
    ``tests/test_dist.py`` for the exactness guarantees.
    """
    import dataclasses
    import functools

    import jax.numpy as jnp
    from jax import shard_map

    from rgcn_tpu.graph.dynamic import (
        _reverse_edge_set_dynamic,
        build_dst_layout_dynamic,
    )

    spec = P(axis_name)

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh, in_specs=(spec,), out_specs=spec,
        check_vma=False
    )
    def build(es_local: EdgeSet) -> EdgeSet:
        layout = build_dst_layout_dynamic(
            es_local.dst, es_local.num_nodes,
            row_block=row_block, chunk=es_local.tile_size,
        )
        rev = _reverse_edge_set_dynamic(
            es_local, row_block, es_local.tile_size
        )
        return dataclasses.replace(es_local, layout=layout, reverse=rev)

    return build(edges)


def prepare_sharded_pairs_host(
    edges: EdgeSet,
    mesh: Mesh,
    axis_name: str = EDGE_AXIS,
    row_block: Optional[int] = None,
    chunk: int = 256,
) -> EdgeSet:
    """Per-shard HOST-built aggregation layouts + unique-(src, rel) pair
    indexes (incl. the composed pair aggregation) for an edge-sharded
    static NC graph.

    The single-device NC trainer's fast path for many-basis featureless
    layers (AM: nb=40) rides the pair pre-contraction + composed pair
    aggregation — 2.0× the explicit fan-out step at AM scale (round 10,
    212.9 vs 426.8 ms). Those indexes are host-built per graph; this
    function carries them to the sharded path: the unsharded host EdgeSet
    (built with ``tile_multiple=mesh.shape[axis_name]`` and NO layout) is
    split into the same contiguous per-shard slices ``P(axis_name)``
    produces, each shard's layout / pair index / composed aggregation is
    built locally with UNIFORM static bounds (the dynamic builders'
    ``num_row_blocks · chunk + ceil(E_local / chunk) · chunk`` shape, so
    every shard compiles the same program), and the per-shard structures
    are concatenated and placed sharded along the mesh axis.

    Exactness: each shard aggregates only its local edges into partial
    ``(N, dout)`` sums; the layer's ``psum`` (manual-AD ``all_reduce``)
    recovers the full-graph sum — the same argument as
    :func:`prepare_sharded_layouts`, proven by ``tests/test_dist.py``.
    Pair dedup is per shard (a (src, rel) pair spanning two shards
    contracts once per shard — redundant compute, never wrong).

    Returns a device EdgeSet ready for
    :func:`rgcn_tpu.dist.train.make_sharded_nc_step` — do NOT pass it
    through :func:`shard_edge_set` (placement happens here).
    """
    import dataclasses

    from rgcn_tpu.graph.structure import (
        PairAggLayout,
        SrcRelPairs,
        auto_nc_row_block,
        build_pair_agg,
        build_pair_src_layout,
        build_src_rel_pairs,
    )
    from rgcn_tpu.ops.pallas_aggregate import DstLayout, build_dst_layout

    n_shards = mesh.shape[axis_name]
    if edges.num_tiles % n_shards:
        raise ValueError(
            f"num_tiles ({edges.num_tiles}) not divisible by mesh axis "
            f"{axis_name!r} ({n_shards}); build the EdgeSet with "
            f"tile_multiple={n_shards}"
        )
    if edges.layout is not None or edges.pairs is not None:
        raise ValueError(
            "pass the bare EdgeSet (no layout/pairs) — per-shard "
            "structures are built here"
        )
    num_nodes, num_rels = edges.num_nodes, edges.num_rels
    if row_block is None:
        row_block = auto_nc_row_block(num_nodes, chunk)
    e_pad = int(edges.src.shape[0])
    e_local = e_pad // n_shards
    nt_local = edges.num_tiles // n_shards

    src = np.asarray(edges.src)
    dst = np.asarray(edges.dst)
    rel = np.asarray(edges.rel)
    val = np.asarray(edges.val)
    tile_rel = np.asarray(edges.tile_rel)

    # Uniform static layout bound (the dynamic builder's shape): every
    # row block holds >= 1 chunk and every edge lands in some chunk.
    nrb = -(-num_nodes // row_block)
    l_bound = nrb * chunk + (-(-e_local // chunk)) * chunk

    locals_ = []
    for k in range(n_shards):
        s = slice(k * e_local, (k + 1) * e_local)
        dst_k = dst[s]
        # scaffolding EdgeSets for the host builders only (the returned
        # EdgeSet keeps the caller's global metadata); the builders mask
        # on the dst sentinel themselves, so num_edges is pass-through
        es_k = EdgeSet(
            src=src[s], dst=dst_k, rel=rel[s], val=val[s],
            tile_rel=tile_rel[k * nt_local:(k + 1) * nt_local],
            num_nodes=num_nodes, num_rels=num_rels,
            tile_size=edges.tile_size,
            num_edges=edges.num_edges,
            layout=build_dst_layout(
                dst_k, num_nodes, row_block=row_block, chunk=chunk,
                pad_to=l_bound,
            ),
        )
        locals_.append(
            dataclasses.replace(es_k, pairs=build_src_rel_pairs(es_k))
        )

    # Equalize the pair axis across shards (extra pads repeat the zero
    # pair, exactly like the builder's own padding), then compose the
    # per-shard aggregation with a uniform backward-layout bound.
    u_max = max(es_k.pairs.pair_src.shape[0] for es_k in locals_)
    rb_grad = auto_nc_row_block(u_max, chunk)
    nrb_grad = -(-u_max // rb_grad)
    lb_bound = nrb_grad * chunk + (-(-l_bound // chunk)) * chunk
    # pairs-grouped-by-source layout (scatter-free dT backward): slots
    # over U_max pair entries, num_nodes segments — same bound law
    # (build_pair_src_layout picks its own auto row block over N)
    rb_src = auto_nc_row_block(num_nodes, chunk)
    nrb_src = -(-num_nodes // rb_src)
    ls_bound = nrb_src * chunk + (-(-u_max // chunk)) * chunk

    def _pad_pairs(p: SrcRelPairs) -> SrcRelPairs:
        extra = u_max - p.pair_src.shape[0]
        if extra == 0:
            return p
        return SrcRelPairs(
            pair_src=np.pad(p.pair_src, (0, extra)),
            pair_rel=np.pad(p.pair_rel, (0, extra)),
            edge_pair=p.edge_pair,
            num_pairs=p.num_pairs,
        )

    for i, es_k in enumerate(locals_):
        pairs_k = _pad_pairs(es_k.pairs)
        es_k = dataclasses.replace(es_k, pairs=pairs_k)
        agg_k = build_pair_agg(es_k, grad_pad_to=lb_bound)
        src_lay_k = build_pair_src_layout(es_k, pad_to=ls_bound)
        locals_[i] = dataclasses.replace(
            es_k,
            pairs=dataclasses.replace(
                pairs_k, agg=agg_k, src_layout=src_lay_k
            ),
        )

    def cat(get):
        # P(axis_name) splits concatenated leaves into n EQUAL contiguous
        # blocks — unequal per-shard pieces would silently land on the
        # wrong devices, so pin uniformity here (the bound math above
        # mirrors the builders' internal row-block law; if either ever
        # drifts, fail loudly instead of mis-sharding)
        pieces = [np.asarray(get(es_k)) for es_k in locals_]
        shape0 = pieces[0].shape
        if any(p.shape != shape0 for p in pieces):
            raise AssertionError(
                f"per-shard structure shapes diverged: "
                f"{[p.shape for p in pieces]} — the uniform static "
                f"bounds no longer match the builders' internals"
            )
        return np.concatenate(pieces, axis=0)

    layout = DstLayout(
        perm=cat(lambda e: e.layout.perm),
        local_dst=cat(lambda e: e.layout.local_dst),
        chunk_block=cat(lambda e: e.layout.chunk_block),
        num_row_blocks=nrb, row_block=row_block, chunk=chunk,
    )
    g0 = locals_[0].pairs.agg.grad_layout
    grad_layout = DstLayout(
        perm=cat(lambda e: e.pairs.agg.grad_layout.perm),
        local_dst=cat(lambda e: e.pairs.agg.grad_layout.local_dst),
        chunk_block=cat(lambda e: e.pairs.agg.grad_layout.chunk_block),
        num_row_blocks=g0.num_row_blocks, row_block=g0.row_block,
        chunk=g0.chunk,
    )
    agg = PairAggLayout(
        slot_pair=cat(lambda e: e.pairs.agg.slot_pair),
        slot_dst=cat(lambda e: e.pairs.agg.slot_dst),
        grad_layout=grad_layout,
        grad_edge=cat(lambda e: e.pairs.agg.grad_edge),
        grad_dst=cat(lambda e: e.pairs.agg.grad_dst),
        slot_val=cat(lambda e: e.pairs.agg.slot_val),
        grad_val=cat(lambda e: e.pairs.agg.grad_val),
    )
    s0 = locals_[0].pairs.src_layout
    src_layout = DstLayout(
        perm=cat(lambda e: e.pairs.src_layout.perm),
        local_dst=cat(lambda e: e.pairs.src_layout.local_dst),
        chunk_block=cat(lambda e: e.pairs.src_layout.chunk_block),
        num_row_blocks=s0.num_row_blocks, row_block=s0.row_block,
        chunk=s0.chunk,
    )
    pairs = SrcRelPairs(
        pair_src=cat(lambda e: e.pairs.pair_src),
        pair_rel=cat(lambda e: e.pairs.pair_rel),
        edge_pair=cat(lambda e: e.pairs.edge_pair),
        # aux metadata must be shard-uniform: record the max real count
        # (informational only — compute uses the padded static shapes)
        num_pairs=max(e.pairs.num_pairs for e in locals_),
        agg=agg,
        src_layout=src_layout,
    )
    out = dataclasses.replace(edges, layout=layout, pairs=pairs)
    return jax.device_put(out, NamedSharding(mesh, P(axis_name)))
