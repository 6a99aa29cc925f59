#!/usr/bin/env python
"""Real-hardware kernel gate: compile and run every Pallas variant on the
actual TPU chip and assert numerics against the XLA oracle.

The CPU test suite exercises the kernels in interpret mode only; this
smoke is what catches Mosaic compilation breaks and on-chip numeric
regressions *before* they show up as a silent bench fallback. Seconds on a
warm compile cache; run via ``make tpu-smoke``.

Checks:
1. XLA relational SpMM (oracle, f32)
2. Pallas message kernel + Pallas sorted aggregation (v1 pipeline)
3. Fused single-pass kernel (v2), f32 and bf16
4. One jitted LP train step (in-jit graph build + custom VJP backward)
Exit code != 0 on any failure.
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main() -> int:
    from rgcn_tpu.utils.compile_cache import enable as _enable_cache

    _enable_cache()

    import jax
    import jax.numpy as jnp

    if jax.default_backend() not in ("tpu", "axon"):
        print("tpu_smoke: no TPU backend available — nothing to gate",
              file=sys.stderr)
        return 0

    from rgcn_tpu.data.synthetic import synthetic_kg
    from rgcn_tpu.graph.structure import build_edge_set
    from rgcn_tpu.ops.spmm import rel_spmm
    from rgcn_tpu.ops.pallas_spmm import rel_spmm_pallas_full
    from rgcn_tpu.ops.pallas_fused import build_fused_layout, rel_spmm_fused

    num_nodes, num_rels, num_edges, dim = 2048, 6, 8192, 128
    triples = synthetic_kg(num_nodes, num_rels, num_edges, seed=3)
    es = build_edge_set(triples, num_nodes, num_rels, tile_size=256,
                        with_dst_layout=True)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(num_nodes, dim)).astype(np.float32))
    w = jnp.asarray(
        rng.normal(size=(2 * num_rels, dim, dim)).astype(np.float32) * 0.1
    )

    failures = []

    def check(name, got, want, rtol, atol):
        got, want = np.asarray(got), np.asarray(want)
        err = np.max(np.abs(got - want) / (np.abs(want) + 1.0))
        ok = np.allclose(got, want, rtol=rtol, atol=atol)
        print(f"{'PASS' if ok else 'FAIL'} {name}: max rel err {err:.2e}")
        if not ok:
            failures.append(name)

    # NOTE: XLA matmuls on TPU run one-pass-bf16 by default for f32
    # inputs, so the oracle itself carries bf16-class rounding; every
    # comparison uses bf16-class tolerances. A broken kernel (wrong
    # indices, bad layout) produces O(1) errors, which is what this gate
    # is for.
    oracle = np.asarray(jax.jit(rel_spmm)(es, x, w))

    got = jax.jit(
        lambda es, x, w: rel_spmm_pallas_full(es, es.layout, x, w)
    )(es, x, w)
    check("pallas_v1_f32", got, oracle, 3e-2, 3e-2)

    fl = build_fused_layout(es, row_block=256, chunk=256, quantum=16)
    got = jax.jit(
        lambda x, w: rel_spmm_fused(fl, num_nodes, x, w, compute_dtype=None)
    )(x, w)
    check("fused_f32", got, oracle, 3e-2, 3e-2)

    got = jax.jit(
        lambda x, w: rel_spmm_fused(
            fl, num_nodes, x, w, compute_dtype=jnp.bfloat16
        )
    )(x, w)
    check("fused_bf16", got, oracle, 5e-2, 5e-2)

    # basis aggregation-first kernel vs the same oracle under
    # basis-constrained weights
    from rgcn_tpu.ops.pallas_basis import rel_spmm_basis_ad

    nb = 2
    bases = jnp.asarray(
        rng.normal(size=(nb, dim, dim)).astype(np.float32) * 0.1
    )
    comps = jnp.asarray(
        rng.normal(size=(2 * num_rels, nb)).astype(np.float32)
    )
    wb = jnp.einsum("rb,bio->rio", comps, bases)
    oracle_b = np.asarray(jax.jit(rel_spmm)(es, x, wb))
    got = jax.jit(
        lambda x: rel_spmm_basis_ad(es, x, bases, comps, compute_dtype=None)
    )(x)
    check("basis_aggfirst_f32", got, oracle_b, 3e-2, 3e-2)

    # coalesced-pair basis path (graph/coalesce.py) — forward AND gradients
    # on hardware vs the unmerged kernel (exact reassociation)
    from rgcn_tpu.graph.coalesce import build_merged_layout
    from rgcn_tpu.ops.pallas_basis import rel_spmm_basis_merged_ad

    merged = build_merged_layout(
        np.asarray(es.dst), np.asarray(es.src), np.asarray(es.rel),
        np.asarray(es.val), num_nodes, es.num_rels,
    )
    merged_dev = jax.tree.map(jnp.asarray, merged)
    got = jax.jit(
        lambda m, x: rel_spmm_basis_merged_ad(
            m, x, bases, comps, compute_dtype=None
        )
    )(merged_dev, x)
    # merged and unmerged sum the same terms in different orders, and TPU
    # matmuls are one-pass bf16 — two differently-associated bf16-rounded
    # computations legitimately differ at ~2x bf16 class (fwd) and one
    # chain-rule step more in the gradient. These tolerances still catch
    # the O(1) errors this gate exists for (bad indices / layouts).
    check("basis_merged_f32", got, oracle_b, 5e-2, 5e-2)

    def _loss_merged(m, x):
        return jnp.sum(
            jnp.sin(rel_spmm_basis_merged_ad(m, x, bases, comps,
                                             compute_dtype=None))
        )

    def _loss_unmerged(x):
        return jnp.sum(
            jnp.sin(rel_spmm_basis_ad(es, x, bases, comps,
                                      compute_dtype=None))
        )

    gm = jax.jit(jax.grad(_loss_merged, argnums=1))(merged_dev, x)
    gu = jax.jit(jax.grad(_loss_unmerged))(x)
    check("basis_merged_grad_x", gm, gu, 1.5e-1, 1.5e-1)

    # diag permute-free kernel
    from rgcn_tpu.ops.pallas_diag import rel_spmm_diag_ad
    from rgcn_tpu.ops.spmm import rel_spmm_diag

    dw = jnp.asarray(
        rng.normal(size=(2 * num_rels, dim)).astype(np.float32)
    )
    oracle_d = np.asarray(jax.jit(rel_spmm_diag)(es, x, dw))
    got = jax.jit(lambda x: rel_spmm_diag_ad(es, x, dw))(x)
    check("diag_presorted", got, oracle_d, 3e-2, 3e-2)

    # one real train step through the custom-VJP backward
    import optax

    from rgcn_tpu.graph.dynamic import build_edge_set_dynamic
    from rgcn_tpu.models import LinkPredictor
    from rgcn_tpu.train.negative import corrupt_batch

    model = LinkPredictor(
        num_nodes=num_nodes, num_relations=num_rels, emb_dim=128,
        hidden1_size=128, num_layers=1, weight_init="schlichtkrull-normal",
        bias_init="zeros", decoder_l2_type="schlichtkrull-l2",
        decoder_l2=0.01, backend="pallas",
    )
    positives = jnp.asarray(triples[:1024])
    edges0 = build_edge_set_dynamic(
        positives, num_nodes, num_rels, tile_size=256, with_dst_layout=True
    )
    params = model.init({"params": jax.random.key(0)}, edges0, positives)
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, positives, key):
        batch, labels = corrupt_batch(key, positives, num_nodes, 4, 0.5)
        edges = build_edge_set_dynamic(
            positives, num_nodes, num_rels, tile_size=256,
            with_dst_layout=True,
        )

        def loss_fn(p):
            scores, penalty = model.apply(p, edges, batch)
            return optax.sigmoid_binary_cross_entropy(
                scores, labels
            ).mean() + 0.01 * penalty

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params, opt_state, loss = step(
        params, opt_state, positives, jax.random.key(1)
    )
    loss = float(loss)
    ok = np.isfinite(loss)
    print(f"{'PASS' if ok else 'FAIL'} lp_train_step_pallas: loss={loss:.5f}")
    if not ok:
        failures.append("lp_train_step_pallas")

    # sharded path under REAL Mosaic: a 1-device mesh compiles the
    # manual-axes (shard_map, check_vma=False) Pallas kernels with the
    # fusion defaults — the exact program a pod would run per shard, which
    # interpret-mode CPU tests cannot gate. Numerics vs the XLA-backend
    # sharded step on identical inputs (same key -> same batch + graph).
    from jax.sharding import Mesh

    from rgcn_tpu.dist.mesh import EDGE_AXIS
    from rgcn_tpu.dist.train import make_sharded_lp_step

    mesh1 = Mesh(np.array(jax.devices()[:1]), (EDGE_AXIS,))
    shard_kwargs = dict(
        num_nodes=num_nodes, num_relations=num_rels, emb_dim=128,
        hidden1_size=128, num_layers=1, weight_init="schlichtkrull-normal",
        bias_init="zeros", decoder_l2_type="schlichtkrull-l2",
        decoder_l2=0.01, axis_name=EDGE_AXIS,
    )
    model_sp = LinkPredictor(backend="pallas", **shard_kwargs)
    model_sx = LinkPredictor(backend="xla", **shard_kwargs)
    # init OUTSIDE shard_map needs the axis-free twin (collectives would
    # hit "unbound axis name") — same pattern as __graft_entry__
    init_kwargs = {k: v for k, v in shard_kwargs.items()
                   if k != "axis_name"}
    params_s = LinkPredictor(**init_kwargs).init(
        {"params": jax.random.key(2)}, edges0, positives
    )
    step_args = dict(
        num_nodes=num_nodes, num_rels=num_rels, tile_size=256,
        num_negatives=4, head_prob=0.5, decoder_l2_weight=0.01,
    )
    tx_s = optax.sgd(1e-2)
    out = {}
    for tag, m, backend in (
        ("pallas", model_sp, "pallas"), ("xla", model_sx, "xla")
    ):
        step_s = make_sharded_lp_step(
            m, tx_s, mesh1, backend=backend, row_block=256, **step_args
        )
        p2, _, loss_s = step_s(
            params_s, tx_s.init(params_s), positives, jax.random.key(5)
        )
        out[tag] = (jax.tree.map(np.asarray, p2), float(loss_s))
        del p2
    ok = np.isfinite(out["pallas"][1])
    print(
        f"{'PASS' if ok else 'FAIL'} sharded_pallas_mosaic_compiles: "
        f"loss={out['pallas'][1]:.5f}"
    )
    if not ok:
        failures.append("sharded_pallas_mosaic_compiles")
    check(
        "sharded_pallas_vs_xla_loss",
        np.asarray([out["pallas"][1]]), np.asarray([out["xla"][1]]),
        3e-2, 3e-2,
    )
    leaves_p = jax.tree.leaves(out["pallas"][0])
    leaves_x = jax.tree.leaves(out["xla"][0])
    max_err = max(
        float(np.max(np.abs(a - b) / (np.abs(b) + 1.0)))
        for a, b in zip(leaves_p, leaves_x)
    )
    ok = len(leaves_p) == len(leaves_x) and max_err < 3e-2
    print(
        f"{'PASS' if ok else 'FAIL'} sharded_pallas_vs_xla_params: "
        f"max rel err {max_err:.2e}"
    )
    if not ok:
        failures.append("sharded_pallas_vs_xla_params")

    # the PRODUCTION sharded step (hosted structured decoder) under real
    # Mosaic: per-shard sorted structured layouts + the two-table weighted
    # aggregation backward. Numerics vs the single-device structured step
    # on identical inputs.
    from rgcn_tpu.dist.host import (
        build_sharded_epoch_host,
        build_sharded_structured_host,
    )
    from rgcn_tpu.dist.train import make_sharded_lp_step_hosted_structured
    from rgcn_tpu.graph.dynamic import build_edge_set_dynamic_host
    from rgcn_tpu.ops.pallas_distmult import build_structured_layouts
    from rgcn_tpu.train.negative import corrupt_batch_host

    pos_np = np.asarray(triples[:512])
    p_cnt, n_neg = pos_np.shape[0], 4
    ch_np, ce_np = corrupt_batch_host(
        np.random.default_rng(3), pos_np, num_nodes, n_neg, 0.5,
        structure_only=True,
    )
    b_real = p_cnt * (1 + n_neg)
    es_1 = build_edge_set_dynamic_host(
        pos_np, num_nodes, num_rels, tile_size=256,
        with_dst_layout=True, row_block=128, layout_chunk=256,
    )
    lays_1 = build_structured_layouts(
        pos_np, ce_np, num_nodes, sorted_corrupt=True, corrupt_head=ch_np,
    )
    labels_st = jnp.concatenate(
        [jnp.ones(p_cnt), jnp.zeros(p_cnt * n_neg)]
    )
    pw_st = jnp.full((b_real,), 1.0 / b_real, jnp.float32)
    model_u = LinkPredictor(backend="pallas", **init_kwargs)

    @jax.jit
    def single_structured(p):
        def loss_fn(p_):
            scores, pen = model_u.apply(
                p_, es_1, jnp.asarray(pos_np), jnp.asarray(ch_np),
                jnp.asarray(ce_np), pw_st, lays_1,
                method=model_u.structured_scores,
            )
            return (
                optax.sigmoid_binary_cross_entropy(
                    scores, labels_st
                ).mean()
                + 0.01 * pen
            )

        loss, grads = jax.value_and_grad(loss_fn)(p)
        upd, _ = tx_s.update(grads, tx_s.init(p), p)
        return optax.apply_updates(p, upd), loss

    p_ref, loss_ref = single_structured(params_s)
    stacked_h = build_sharded_epoch_host(
        pos_np, num_nodes, num_rels, 256, 1,
        row_block=128, layout_chunk=256,
    )
    structured_h = build_sharded_structured_host(
        pos_np, ch_np, ce_np, num_nodes, 1,
    )
    step_h = make_sharded_lp_step_hosted_structured(
        model_sp, tx_s, mesh1, decoder_l2_weight=0.01,
        num_nodes=num_nodes,
    )
    p_h, _, loss_h = step_h(
        params_s, tx_s.init(params_s), stacked_h, structured_h,
        jax.random.key(11),
    )
    check(
        "sharded_structured_vs_single_loss",
        np.asarray([float(loss_h)]), np.asarray([float(loss_ref)]),
        3e-2, 3e-2,
    )
    max_err_h = max(
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))
                     / (np.abs(np.asarray(b)) + 1.0)))
        for a, b in zip(jax.tree.leaves(p_h), jax.tree.leaves(p_ref))
    )
    ok = max_err_h < 3e-2
    print(
        f"{'PASS' if ok else 'FAIL'} sharded_structured_vs_single_params: "
        f"max rel err {max_err_h:.2e}"
    )
    if not ok:
        failures.append("sharded_structured_vs_single_params")

    # sharded NC step under real Mosaic (the program each shard of the
    # multi-chip NC driver runs; interpret-mode CPU tests cannot gate
    # Mosaic): pallas-vs-xla backend on identical inputs
    from rgcn_tpu.dist.mesh import prepare_sharded_layouts, shard_edge_set
    from rgcn_tpu.dist.train import make_sharded_nc_step
    from rgcn_tpu.graph.structure import build_edge_set
    from rgcn_tpu.models import NodeClassifier

    rng_nc = np.random.default_rng(3)
    n_nc, r_nc, c_nc = 600, 6, 4
    tri_nc = np.stack(
        [
            rng_nc.integers(0, n_nc, 3000),
            rng_nc.integers(0, r_nc, 3000),
            rng_nc.integers(0, n_nc, 3000),
        ],
        axis=1,
    )
    nc_kwargs = dict(
        num_nodes=n_nc, num_relations=r_nc, num_classes=c_nc,
        hidden_size=16, decomposition="basis", num_bases=3,
    )
    es_nc = build_edge_set(tri_nc, n_nc, r_nc, tile_size=128)
    es_nc_s = shard_edge_set(es_nc, mesh1)
    es_nc_p = prepare_sharded_layouts(es_nc_s, mesh1, row_block=128)
    params_nc = NodeClassifier(**nc_kwargs).init(jax.random.key(6), es_nc)
    idx_nc = jnp.arange(48)
    lbl_nc = jnp.asarray(rng_nc.integers(0, c_nc, 48))
    out_nc = {}
    for tag, es_use in (("pallas", es_nc_p), ("xla", es_nc_s)):
        model_nc = NodeClassifier(
            axis_name=EDGE_AXIS, backend=tag, **nc_kwargs
        )
        step_nc = make_sharded_nc_step(
            model_nc, tx_s, mesh1, idx_nc, lbl_nc, layer1_l2=0.01
        )
        p2, _, loss_nc = step_nc(params_nc, tx_s.init(params_nc), es_use)
        out_nc[tag] = (jax.tree.map(np.asarray, p2), float(loss_nc))
        del p2
    ok = np.isfinite(out_nc["pallas"][1])
    print(
        f"{'PASS' if ok else 'FAIL'} sharded_nc_mosaic_compiles: "
        f"loss={out_nc['pallas'][1]:.5f}"
    )
    if not ok:
        failures.append("sharded_nc_mosaic_compiles")
    check(
        "sharded_nc_pallas_vs_xla_loss",
        np.asarray([out_nc["pallas"][1]]), np.asarray([out_nc["xla"][1]]),
        3e-2, 3e-2,
    )
    max_err_nc = max(
        float(np.max(np.abs(a - b) / (np.abs(b) + 1.0)))
        for a, b in zip(
            jax.tree.leaves(out_nc["pallas"][0]),
            jax.tree.leaves(out_nc["xla"][0]),
        )
    )
    ok = max_err_nc < 3e-2
    print(
        f"{'PASS' if ok else 'FAIL'} sharded_nc_pallas_vs_xla_params: "
        f"max rel err {max_err_nc:.2e}"
    )
    if not ok:
        failures.append("sharded_nc_pallas_vs_xla_params")

    if failures:
        print(f"tpu_smoke FAILED: {failures}", file=sys.stderr)
        return 1
    print("tpu_smoke: all kernel variants PASS on hardware")
    return 0


if __name__ == "__main__":
    sys.exit(main())
