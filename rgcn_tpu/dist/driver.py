"""Multi-chip link-prediction training driver.

The sharded twin of :func:`rgcn_tpu.train.link_prediction.train_link_predictor`:
same loop semantics (sampled positive subgraph per epoch, BCE + decoder L2,
periodic filtered evaluation), executed over a device mesh:

* the background epoch pipeline builds per-shard EdgeSets with Pallas
  layouts (:func:`rgcn_tpu.dist.host.build_sharded_epoch_host`) and draws
  the negatives on the host;
* the step is :func:`rgcn_tpu.dist.train.make_sharded_lp_step_hosted`
  (edge-partitioned encoder over the ``edge`` axis, scoring batch over the
  whole mesh, manual-AD collectives);
* evaluation shards the candidate sweep
  (:func:`rgcn_tpu.dist.evaluate.evaluate_link_predictor_sharded`).

Works on 1-D edge meshes and 2-D ``(replica × edge)`` multi-host meshes
(build the mesh with :func:`rgcn_tpu.dist.multihost.make_mesh_2d` after
:func:`rgcn_tpu.dist.multihost.initialize_distributed`). Every process runs
the same program on the same per-epoch RNG seeds, so host-built inputs are
identical across processes — the jit handles cross-process arrays.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from rgcn_tpu.config import LinkPredictionExperiment
from rgcn_tpu.data.loaders import LinkPredictionData
from rgcn_tpu.dist.host import build_sharded_epoch_host
from rgcn_tpu.dist.mesh import EDGE_AXIS
from rgcn_tpu.dist.train import (
    make_sharded_lp_step_hosted,
    make_sharded_lp_step_hosted_structured,
)
from rgcn_tpu.graph.dynamic import build_edge_set_dynamic
from rgcn_tpu.graph.structure import build_edge_set
from rgcn_tpu.train.link_prediction import build_lp_model
from rgcn_tpu.train.negative import corrupt_batch_host
from rgcn_tpu.train.optim import make_optimizer
from rgcn_tpu.train.samplers import select_sampler
from rgcn_tpu.utils.logging import ScalarLogger

__all__ = ["train_link_predictor_sharded", "train_node_classifier_sharded"]


def _pin_sharded(
    fn, exe_cache_dir, tag, mesh, logger,
    search: int = 0, search_runner=None,
):
    """Wrap an (already jitted) sharded step in
    :class:`rgcn_tpu.utils.exe_cache.PinnedJit` when pinning is requested —
    the sharded twin of the single-device trainers' ``exe_cache_dir``
    support (compile draws of identical HLO spread ~2x long-chain truth at
    AM scale; see docs/PERF.md law 4).

    Single-process meshes re-bind the loaded executable to the compiling
    mesh's own device order (``devices=``). Multi-PROCESS (multi-host)
    jobs pin per process: each process serializes/loads its own entry
    keyed by (HLO, tag, process index, local device assignment) and the
    executable re-binds by global device id (see exe_cache.PinnedJit /
    serialize_compiled; warm-start proven by
    ``benchmarks/multiprocess_dryrun.py --pin``). Draw search stays
    single-process (exe_cache disables it with a notice under
    multi-process — collective lockstep)."""
    if not exe_cache_dir:
        return fn
    from rgcn_tpu.utils.exe_cache import PinnedJit

    return PinnedJit(
        fn, exe_cache_dir, tag=tag,
        search=search, search_runner=search_runner,
        devices=list(mesh.devices.flat),
    )


def _sharded_chain_runner(compiled, args):
    """Chained-diff seconds/step of a candidate sharded step executable
    ``(params, opt_state, *rest) -> (params, opt_state, loss)``. The
    sharded steps do not donate, so the caller's originals survive;
    fetching the loss scalar is the only reliable sync on the tunneled
    backend, and differencing two chain lengths cancels its RPC cost.

    The chain length adapts to the one-shot step magnitude (bench.py's
    methodology): sub-100ms steps sit inside RPC/timer jitter at short
    chains — the repo's measurement notes record negative dts and 40%
    under-reads at <30 iterations — so fast steps earn long chains while
    stress-scale steps keep the chain window bounded (~1.5 s net)."""
    import time as _time

    p0, o0 = args[0], args[1]
    rest = args[2:]

    def run(k):
        p, o = p0, o0
        best = None
        for _ in range(2):
            t0 = _time.perf_counter()
            for _ in range(k):
                p, o, loss = compiled(p, o, *rest)
            float(loss)
            dt = _time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best

    one = run(1)  # warm-up + one-shot magnitude (incl. fetch RPC)
    # net chain work targets ~1.5 s, clamped to [4, 64] iterations: a 1 ms
    # toy/CPU step gets the full 64 (jitter-immune), a 500 ms stress step
    # keeps 4 (a longer window would absorb congestion bursts instead).
    iters = int(max(4, min(64, round(1.5 / max(one, 1e-4)))))
    return max((run(1 + iters) - run(1)) / iters, 1e-9)


def train_link_predictor_sharded(
    cfg: LinkPredictionExperiment,
    data: LinkPredictionData,
    mesh,
    seed: int = 0,
    logger: Optional[ScalarLogger] = None,
    tile_size: int = 128,
    max_epochs: Optional[int] = None,
    edge_axis: str = EDGE_AXIS,
    backend: str = "pallas",
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: Optional[int] = None,
    exe_cache_dir: Optional[str] = None,
    exe_search: int = 0,
):
    """Train over the mesh; returns (final_mrr, hits, ranks, params).

    ``checkpoint_dir`` enables process-0-writes / all-restore persistence
    (:mod:`rgcn_tpu.dist.checkpoint`); resume reproduces the exact RNG
    schedule of an uninterrupted run (epoch-indexed keys, like the
    single-device driver). ``exe_cache_dir`` pins the compiled sharded
    step across processes (``exe_search=N`` draw-searches on the first
    miss); single-process meshes only — see :func:`_pin_sharded`."""
    import time
    from concurrent.futures import ThreadPoolExecutor

    logger = logger or ScalarLogger()
    enc = cfg.encoder
    if enc.decomposition and enc.decomposition.type == "block":
        block_size = enc.node_embedding // enc.decomposition.num_blocks
        data.pad_nodes(block_size)

    num_nodes, num_rels = data.num_nodes, data.num_relations
    train_np = np.asarray(data.train, dtype=np.int64)
    test_np = np.asarray(data.test, dtype=np.int64)

    all_axes = tuple(mesh.axis_names)
    edge_shards = mesh.shape[edge_axis]

    model = build_lp_model(
        cfg, num_nodes, num_rels,
        axis_name=edge_axis, decoder_axis_name=all_axes, backend=backend,
    )
    init_model = build_lp_model(cfg, num_nodes, num_rels)

    ed = enc.edge_dropout
    general_dropout = ed.general if ed else 0.0
    structural_self_keep = (
        1.0 - ed.self_loop
        if (
            ed is not None
            and ed.self_loop_type != "schlichtkrull-dropout"
            and ed.self_loop > 0.0
        )
        else None
    )

    batch_size = min(
        cfg.training.graph_batch_size or len(train_np), len(train_np)
    )
    ns_cfg = cfg.training.negative_sampling
    num_neg = ns_cfg.sampling_rate if ns_cfg else 10
    head_prob = ns_cfg.head_prob if ns_cfg else 0.5
    sampler = select_sampler(cfg.training.sampling_method)

    init_pos = jnp.asarray(train_np[:batch_size])
    params = init_model.init(
        {"params": jax.random.key(seed), "dropout": jax.random.key(seed + 1)},
        build_edge_set_dynamic(init_pos, num_nodes, num_rels, tile_size=tile_size),
        init_pos,
    )
    opt = cfg.training.optimiser
    tx = make_optimizer(opt.algorithm, opt.learn_rate, opt.weight_decay)
    opt_state = tx.init(params)

    # the single-device production decoder (structured negatives, sorted
    # scatter-free backward) shards too — shared eligibility predicate
    # with rgcn_tpu.train.link_prediction
    structured_ok = cfg.structured_decoder_ok(backend == "pallas")
    if structured_ok:
        step = make_sharded_lp_step_hosted_structured(
            model, tx, mesh,
            num_nodes=num_nodes,
            structural_self_keep=structural_self_keep,
            decoder_l2_weight=cfg.decoder.l2_penalty,
            want_penalty=cfg.decoder.l2_penalty > 0.0,
            axis_name=edge_axis,
        )
    else:
        step = make_sharded_lp_step_hosted(
            model, tx, mesh,
            num_nodes=num_nodes,
            structural_self_keep=structural_self_keep,
            decoder_l2_weight=cfg.decoder.l2_penalty,
            axis_name=edge_axis,
        )
    step = _pin_sharded(
        step, exe_cache_dir, "sharded_lp_step", mesh, logger,
        search=exe_search, search_runner=_sharded_chain_runner,
    )

    def sample_epoch(epoch):
        if batch_size >= len(train_np):
            positives = train_np
        else:
            positives = sampler(
                train_np, batch_size, np.random.default_rng((seed, epoch))
            )
        stacked = build_sharded_epoch_host(
            positives, num_nodes, num_rels, tile_size, edge_shards,
            dropout_rate=general_dropout,
            dropout_rng=np.random.default_rng((seed, epoch, 7)),
        )
        if structured_ok:
            ch_, ce_ = corrupt_batch_host(
                np.random.default_rng((seed, epoch, 11)),
                positives, num_nodes, num_neg, head_prob,
                structure_only=True,
            )
            from rgcn_tpu.dist.host import build_sharded_structured_host

            structured = build_sharded_structured_host(
                positives, ch_, ce_, num_nodes, mesh.size
            )
            return stacked, (structured,)
        batch, labels = corrupt_batch_host(
            np.random.default_rng((seed, epoch, 11)),
            positives, num_nodes, num_neg, head_prob,
        )
        return stacked, (batch, labels)

    pool = ThreadPoolExecutor(max_workers=1)
    pending = {}

    def get_epoch(epoch):
        fut = pending.pop(epoch, None)
        out = fut.result() if fut is not None else sample_epoch(epoch)
        for e in range(epoch + 1, min(epoch + 3, epochs + 1)):
            if e not in pending:
                pending[e] = pool.submit(sample_epoch, e)
        return out

    epochs = max_epochs if max_epochs is not None else cfg.training.epochs
    base_key = jax.random.key(seed + 2)

    start_epoch = 1
    if checkpoint_dir:
        from rgcn_tpu.dist.checkpoint import restore_checkpoint_replicated

        restored, ck_step = restore_checkpoint_replicated(
            checkpoint_dir, {"params": params, "opt_state": opt_state}
        )
        if restored is not None:
            params = restored["params"]
            opt_state = restored["opt_state"]
            start_epoch = ck_step + 1
            logger.info(f"resumed from checkpoint at epoch {ck_step}")
    # basis encoders evaluate through the coalesced-pair layout (the full
    # graph carries every reciprocal duplicate — see graph/coalesce.py);
    # the sharded part of evaluation is the candidate sweep, the encode
    # itself runs unsharded (init_model below), so the merged dispatch
    # applies directly.
    from rgcn_tpu.graph.coalesce import merge_applicable

    merge_eval = enc.decomposition is not None and merge_applicable(
        2 * num_rels,
        decomposition=enc.decomposition.type,
        num_bases=enc.decomposition.num_bases,
    )
    # one-time transfer: jit re-transfers numpy argument leaves per call
    # (a host->device RPC per evaluation on tunneled backends, probe_amctx)
    eval_edges = jax.device_put(build_edge_set(
        train_np, num_nodes, num_rels, tile_size=tile_size,
        with_dst_layout=True, with_merged_layout=merge_eval,
    ))
    from rgcn_tpu.train.evaluate import build_filters

    filters = (
        build_filters(test_np, data.all_triples, num_nodes)
        if cfg.evaluation.filtered
        else None
    )

    stacked, payload = get_epoch(start_epoch)
    ck_every = checkpoint_every or cfg.evaluation.check_every
    for epoch in range(start_epoch, epochs + 1):
        t1 = time.time()
        sub = jax.random.fold_in(base_key, epoch)
        params, opt_state, loss = step(
            params, opt_state, stacked, *payload, sub
        )
        if epoch < epochs:
            stacked, payload = get_epoch(epoch + 1)
        loss = float(loss)
        if checkpoint_dir and epoch % ck_every == 0:
            from rgcn_tpu.dist.checkpoint import save_checkpoint_replicated

            save_checkpoint_replicated(
                checkpoint_dir,
                {"params": params, "opt_state": opt_state},
                epoch,
            )
        logger.log_scalar("training.loss", loss, step=epoch)
        logger.info(
            f"[Epoch {epoch}] Loss: {loss:.5f} Step: {time.time() - t1:.3f}s"
        )
    pool.shutdown(wait=False, cancel_futures=True)

    # final-state checkpoint (epochs rarely divides the cadence; serving
    # loads the LATEST step) — skipped when a resumed run already sits
    # past the target epoch count, or when the in-loop cadence save just
    # wrote this exact step
    if checkpoint_dir and epochs >= start_epoch and epochs % ck_every != 0:
        from rgcn_tpu.dist.checkpoint import save_checkpoint_replicated

        save_checkpoint_replicated(
            checkpoint_dir,
            {"params": params, "opt_state": opt_state},
            epochs,
        )

    from rgcn_tpu.dist.evaluate import evaluate_link_predictor_sharded

    mrr, hits, ranks = evaluate_link_predictor_sharded(
        init_model, params, eval_edges, test_np, filters, mesh,
        batch_size=max(cfg.evaluation.batch_size, 16), axis=edge_axis,
        exe_cache_dir=exe_cache_dir,
    )
    logger.info(
        f"[Final Scores] MRR: {mrr:.4f} Hits@1: {hits[0]:.4f} "
        f"Hits@3: {hits[1]:.4f} Hits@10: {hits[2]:.4f}"
    )
    return mrr, hits, ranks, params


def train_node_classifier_sharded(
    cfg,
    data,
    mesh,
    seed: int = 0,
    logger: Optional[ScalarLogger] = None,
    tile_size: int = 128,
    edge_axis: str = EDGE_AXIS,
    backend: str = "pallas",
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: Optional[int] = None,
    log_suffix: str = "",
    row_block: Optional[int] = None,  # None -> auto_nc_row_block(N)
    exe_cache_dir: Optional[str] = None,
    exe_search: int = 0,
) -> float:
    """Multi-chip node-classification training (full batch, static graph).

    The sharded twin of
    :func:`rgcn_tpu.train.node_classification.train_node_classifier`:
    the static graph is edge-partitioned over the mesh's edge axis
    (:func:`rgcn_tpu.dist.mesh.shard_edge_set`), the step is
    :func:`rgcn_tpu.dist.train.make_sharded_nc_step` (per-shard message
    passing, manual-AD collectives, replicated params), per-epoch
    train/test accuracies come from a sharded forward. ``backend='pallas'``
    additionally builds per-shard destination layouts
    (:func:`rgcn_tpu.dist.mesh.prepare_sharded_layouts`). Many-basis
    featureless configs additionally carry per-shard HOST-built pair
    indexes + composed pair aggregations
    (:func:`rgcn_tpu.dist.mesh.prepare_sharded_pairs_host`) — the same
    2.0× AM-scale structure the single-device trainer rides. The
    coalesced (merged) index stays single-device only.

    Returns final test accuracy (percent). Exactness vs the single-device
    trainer is pinned by ``tests/test_dist.py``.
    """
    import time

    from rgcn_tpu.dist.mesh import prepare_sharded_layouts, shard_edge_set
    from rgcn_tpu.dist.train import make_sharded_nc_step
    from rgcn_tpu.train.evaluate import accuracy
    from rgcn_tpu.train.node_classification import build_nc_model

    logger = logger or ScalarLogger()
    rg = cfg.rgcn
    n_shards = mesh.shape[edge_axis]

    model = build_nc_model(cfg, data, axis_name=edge_axis, backend=backend)
    init_model = build_nc_model(cfg, data)

    es = build_edge_set(
        data.triples, data.num_nodes, data.num_relations,
        tile_size=tile_size, tile_multiple=n_shards,
    )
    # Many-basis featureless configs (AM: nb=40) ride the pair
    # pre-contraction + composed pair aggregation on the single-device
    # trainer (2.0× at AM scale, round 10) — carry the same host-built
    # structures per shard so the sharded path keeps the win. Same
    # gating as train_node_classifier's pair_ok.
    decomp = rg.decomposition
    pair_ok = (
        backend == "pallas"
        and rg.model == "rgcn"
        and decomp is not None
        and decomp.type == "basis"
        and decomp.num_bases > 8
    )
    if pair_ok:
        from rgcn_tpu.dist.mesh import prepare_sharded_pairs_host

        es_s = prepare_sharded_pairs_host(
            es, mesh, axis_name=edge_axis, row_block=row_block
        )
    else:
        es_s = shard_edge_set(es, mesh, axis_name=edge_axis)
        if backend == "pallas":
            if row_block is None:
                from rgcn_tpu.graph.structure import auto_nc_row_block

                row_block = auto_nc_row_block(data.num_nodes)
            es_s = prepare_sharded_layouts(
                es_s, mesh, axis_name=edge_axis, row_block=row_block
            )

    train_idx_np, train_lbl_np = data.index_labels(data.train)
    test_idx_np, test_lbl_np = data.index_labels(data.test)
    train_idx = jnp.asarray(train_idx_np)
    train_lbl = jnp.asarray(train_lbl_np)

    params = init_model.init(jax.random.key(seed), es)
    opt = cfg.training.optimiser
    tx = make_optimizer(opt.algorithm, opt.learn_rate, opt.weight_decay)
    opt_state = tx.init(params)

    emb_pen = rg.node_embedding_l2_penalty
    if emb_pen > 0.0 and rg.model != "e-rgcn":
        raise ValueError(
            f"cannot apply L2-regularisation on node embeddings for "
            f"{rg.model} model"
        )
    step = make_sharded_nc_step(
        model, tx, mesh, train_idx, train_lbl,
        layer1_l2=rg.layer1_l2_penalty, embedding_l2=emb_pen,
        axis_name=edge_axis,
    )
    step = _pin_sharded(
        step, exe_cache_dir, "sharded_nc_step", mesh, logger,
        search=exe_search, search_runner=_sharded_chain_runner,
    )

    import functools

    from jax.sharding import PartitionSpec as P

    def _predict(params, edges):
        @functools.partial(
            jax.shard_map, mesh=mesh, in_specs=(P(), P(edge_axis)),
            out_specs=P(), check_vma=False,
        )
        def fwd(params, edges):
            return model.apply(params, edges)  # replicated after psums

        return jnp.argmax(fwd(params, edges), axis=-1)

    predict = _pin_sharded(
        jax.jit(_predict), exe_cache_dir, "sharded_nc_predict", mesh, logger
    )

    start_epoch = 1
    if checkpoint_dir:
        from rgcn_tpu.dist.checkpoint import restore_checkpoint_replicated

        restored, ck_step = restore_checkpoint_replicated(
            checkpoint_dir, {"params": params, "opt_state": opt_state}
        )
        if restored is not None:
            params = restored["params"]
            opt_state = restored["opt_state"]
            start_epoch = ck_step + 1
            logger.info(f"resumed from checkpoint at epoch {ck_step}")

    epochs = cfg.training.epochs
    for epoch in range(start_epoch, epochs + 1):
        t1 = time.time()
        params, opt_state, loss = step(params, opt_state, es_s)
        loss = float(loss)
        t2 = time.time()
        pred = np.asarray(predict(params, es_s))
        train_acc = accuracy(pred[train_idx_np], train_lbl_np)
        test_acc = accuracy(pred[test_idx_np], test_lbl_np)
        t3 = time.time()
        logger.log_scalar(f"training.loss{log_suffix}", loss, step=epoch)
        logger.log_scalar(
            f"training.accuracy{log_suffix}", train_acc, step=epoch
        )
        logger.log_scalar(f"test.accuracy{log_suffix}", test_acc, step=epoch)
        logger.info(
            f"[Epoch {epoch}] Loss: {loss:.5f} Step: {(t2 - t1):.3f}s "
            f"Eval: {(t3 - t2):.3f}s Train Accuracy: {train_acc:.2f} "
            f"Test Accuracy: {test_acc:.2f}"
        )
        if checkpoint_dir and epoch % (checkpoint_every or 10) == 0:
            from rgcn_tpu.dist.checkpoint import save_checkpoint_replicated

            save_checkpoint_replicated(
                checkpoint_dir,
                {"params": params, "opt_state": opt_state},
                epoch,
            )

    if (
        checkpoint_dir
        and epochs >= start_epoch
        and epochs % (checkpoint_every or 10) != 0
    ):
        from rgcn_tpu.dist.checkpoint import save_checkpoint_replicated

        save_checkpoint_replicated(
            checkpoint_dir, {"params": params, "opt_state": opt_state},
            epochs,
        )

    pred = np.asarray(predict(params, es_s))
    test_acc = accuracy(pred[test_idx_np], test_lbl_np)
    logger.info(f"[Evaluation] Test Accuracy: {test_acc:.2f}")
    return test_acc
