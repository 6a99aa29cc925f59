"""Link-prediction training driver.

Reference: ``/root/reference/experiments/predict_links.py``. Loop structure
preserved — sample a positive subgraph, draw negatives, apply edge dropout,
BCE-with-logits + decoder L2, periodic filtered ranking evaluation — but
executed TPU-first:

* the *entire* train step (negative sampling, inverse generation, edge
  dropout, degree normalization, message passing, loss, optimizer) is one
  jitted program with static shapes; only positive sampling stays on host;
* evaluation encodes the graph **once** per eval and sweeps all candidates
  with dense matmuls (the reference re-ran the encoder per 16-triple batch,
  ``utils/misc.py:86``);
* the reference's general-edge-dropout slice bug — it keeps
  ``graph[sample_size:]``, i.e. the *complement*, which is only correct at
  rate 0.5 (``predict_links.py:143-148``) — is not reproduced: keep means
  keep.
"""

from __future__ import annotations

import functools
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rgcn_tpu.config import LinkPredictionExperiment
from rgcn_tpu.data.loaders import LinkPredictionData
from rgcn_tpu.graph.dynamic import build_edge_set_dynamic
from rgcn_tpu.graph.structure import build_edge_set
from rgcn_tpu.models import CompressionRelationPredictor, LinkPredictor
from rgcn_tpu.train.evaluate import (
    RankingFilters,
    build_filters,
    evaluate_ranking,
    ranking_metrics,
)
from rgcn_tpu.ops.pallas_distmult import (
    build_batch_layouts,
    build_structured_layouts,
)
from rgcn_tpu.train.negative import (
    corrupt_batch,
    corrupt_batch_host,
    negative_structure,
)
from rgcn_tpu.train.optim import make_optimizer
from rgcn_tpu.train.samplers import select_sampler
from rgcn_tpu.utils.logging import ScalarLogger

__all__ = ["build_lp_model", "train_link_predictor", "evaluate_link_predictor"]


def build_lp_model(cfg: LinkPredictionExperiment, num_nodes: int,
                   num_rels: int, **extra):
    """``extra`` forwards module attributes (axis_name, decoder_axis_name,
    backend) for sharded construction (rgcn_tpu.dist.driver)."""
    enc, dec = cfg.encoder, cfg.decoder
    decomp = enc.decomposition
    ed = enc.edge_dropout
    sl_dropout = (
        ed.self_loop
        if ed is not None and ed.self_loop_type == "schlichtkrull-dropout"
        else 0.0
    )
    common = dict(
        num_nodes=num_nodes,
        num_relations=num_rels,
        emb_dim=enc.node_embedding or 200,
        hidden1_size=enc.hidden1_size,
        hidden2_size=enc.hidden2_size,
        num_layers=enc.num_layers,
        decomposition=decomp.type if decomp else None,
        num_bases=decomp.num_bases if decomp else 0,
        num_blocks=decomp.num_blocks if decomp else 0,
        weight_init=enc.weight_init,
        include_gain=enc.include_gain,
        bias_init=enc.bias_init,
        self_loop_dropout=sl_dropout,
        decoder_l2_type=dec.l2_penalty_type,
        decoder_l2=dec.l2_penalty,
        decoder_weight_init=dec.weight_init,
        decoder_include_gain=dec.include_gain,
        decoder_bias_init=dec.bias_init,
        decoder_bwd_dtype=dec.bwd_dtype,
    )
    common.update(extra)
    if enc.model == "rgcn":
        return LinkPredictor(**common)
    if enc.model == "c-rgcn":
        return CompressionRelationPredictor(**common)
    raise NotImplementedError(f"{enc.model!r} encoder has not been implemented")


def _eval_fns(model, exe_cache_dir: Optional[str] = None):
    """Canonicalizing front for :func:`_eval_fns_cached`: callers use both
    ``_eval_fns(model)`` and ``_eval_fns(model, None)``, which lru_cache
    would key separately and so compile the identical eval programs twice
    (minutes each on this backend). Normalize the arity here so every call
    style shares one cache entry."""
    return _eval_fns_cached(model, exe_cache_dir or None)


@functools.lru_cache(maxsize=8)
def _eval_fns_cached(model, exe_cache_dir: Optional[str]):
    """Jitted encode/rank-sweep functions, cached per model so repeated
    evaluations during training reuse one compilation (fresh ``jax.jit``
    wrappers per call would recompile every eval — minutes on this
    backend). flax modules are frozen dataclasses, hence hashable.

    ``exe_cache_dir`` additionally pins the compiled programs ACROSS
    processes (:class:`rgcn_tpu.utils.exe_cache.PinnedJit`): a restarted
    run (resume, ``make parity``'s 12 processes, a periodic-eval cadence
    over many restarts) re-traces but no longer re-compiles its eval
    programs — the same cold-start win serving gets for its encoder.

    Each rank sweep is one scanned device program over all evaluation
    batches (see :func:`rgcn_tpu.train.evaluate.scan_ranks`) — a handful of
    dispatches per evaluation instead of thousands."""
    from rgcn_tpu.train.evaluate import scan_ranks

    def _wrap(fn, tag):
        if exe_cache_dir:
            from rgcn_tpu.utils.exe_cache import PinnedJit

            return PinnedJit(fn, exe_cache_dir, tag=tag)
        return jax.jit(fn)

    encode = _wrap(
        lambda p, edges: model.apply(p, edges, method=model.encode),
        "lp_eval_encode",
    )

    def make_sweep(method, tag):
        def sweep(p, z, batches, filts, tgts, valids):
            return scan_ranks(
                lambda batch: model.apply(p, batch, z, method=method),
                batches, filts, tgts, valids,
            )

        return _wrap(sweep, tag)

    rank_h = make_sweep(model.score_heads, "lp_eval_rank_h")
    rank_t = make_sweep(model.score_tails, "lp_eval_rank_t")
    return encode, rank_h, rank_t


def evaluate_link_predictor(
    model,
    params,
    eval_edges,
    test: np.ndarray,
    filters: Optional[RankingFilters],
    batch_size: int = 512,
    verbose: bool = False,
    logger=None,
    exe_cache_dir: Optional[str] = None,
) -> Tuple[float, Tuple[float, float, float], np.ndarray]:
    """Filtered/raw MRR and Hits@{1,3,10} over head and tail prediction.

    ``exe_cache_dir`` pins the compiled encode/sweep programs across
    processes (see :func:`_eval_fns`)."""
    from rgcn_tpu.train.evaluate import batched_eval_arrays

    num_test = len(test)

    encode, rank_h, rank_t = _eval_fns(model, exe_cache_dir)
    z = encode(params, eval_edges)

    if filters is not None:
        head_filt, tail_filt = filters.heads, filters.tails
    else:
        head_filt = np.full((num_test, 1), 2**30, dtype=np.int32)
        tail_filt = head_filt

    def say(msg):
        if verbose:
            (logger.info if logger is not None else print)(msg)

    ranks = []
    for tag, sweep, filt, tgt in (
        ("head", rank_h, head_filt, test[:, 0]),
        ("tail", rank_t, tail_filt, test[:, 2]),
    ):
        t0 = time.time()
        arrays = batched_eval_arrays(test, filt, tgt, batch_size)
        r = np.asarray(
            sweep(params, z, *(jnp.asarray(a) for a in arrays))
        ).reshape(-1)[:num_test]
        say(
            f"  {tag} sweep: {num_test} triples x {z.shape[0]} candidates "
            f"in {time.time() - t0:.2f}s"
        )
        ranks.append(r)

    ranks = np.concatenate(ranks)
    mrr, hits = ranking_metrics(ranks)
    return mrr, hits, ranks


def train_link_predictor(
    cfg: LinkPredictionExperiment,
    data: LinkPredictionData,
    seed: int = 0,
    logger: Optional[ScalarLogger] = None,
    tile_size: int = 128,
    max_epochs: Optional[int] = None,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: Optional[int] = None,
    pallas_train_step: Optional[bool] = None,
    host_graph_build: Optional[bool] = None,
    feature_blocks: bool = False,
    exe_cache_dir: Optional[str] = None,
    exe_search: int = 0,
):
    """Train and evaluate; returns (final_mrr, hits, ranks, params).

    ``exe_cache_dir`` pins the compiled train step across processes
    (:class:`rgcn_tpu.utils.exe_cache.PinnedJit`, HLO-hash keyed; buffer
    donation is preserved through serialization) — kills the
    minutes-long remote recompile and the compile-draw lottery on
    restarts. Off by default. ``exe_search=N`` additionally compiles N
    draws on the first miss and pins the fastest (measured on device
    copies — the step donates its params/opt_state buffers).
    """
    logger = logger or ScalarLogger()
    enc = cfg.encoder

    # Node padding for block decomposition (predict_links.py:54-67).
    if enc.decomposition and enc.decomposition.type == "block":
        if not enc.node_embedding:
            raise ValueError("block decomposition requires node_embedding")
        block_size = enc.node_embedding // enc.decomposition.num_blocks
        added = data.pad_nodes(block_size)
        if added:
            logger.info(
                f"nodes padded to {data.num_nodes} to make it divisible by "
                f"{block_size} (added {added} null nodes)."
            )

    num_nodes, num_rels = data.num_nodes, data.num_relations
    train_np = np.asarray(data.train, dtype=np.int64)
    test_np = np.asarray(data.test, dtype=np.int64)

    model = build_lp_model(
        cfg, num_nodes, num_rels, feature_blocks=feature_blocks
    )

    ed = enc.edge_dropout
    general_dropout = ed.general if ed else 0.0
    structural_self = (
        ed is not None
        and ed.self_loop_type != "schlichtkrull-dropout"
        and ed.self_loop > 0.0
    )
    self_keep_prob = 1.0 - (ed.self_loop if ed else 0.0)

    batch_size = cfg.training.graph_batch_size or len(train_np)
    batch_size = min(batch_size, len(train_np))
    ns_cfg = cfg.training.negative_sampling
    num_neg = ns_cfg.sampling_rate if ns_cfg else 10
    head_prob = ns_cfg.head_prob if ns_cfg else 0.5

    sampler = select_sampler(cfg.training.sampling_method)

    # Per-step graphs can carry the Pallas destination layout too; defaults
    # to on for TPU backends, off elsewhere.
    if pallas_train_step is None:
        pallas_train_step = jax.default_backend() in ("tpu", "axon")

    # Host-side graph construction: LP runs ONE step per sampled subgraph,
    # so the whole build (dropout masking, sorts, degree renormalization,
    # tiling, Pallas layouts for forward AND reverse) runs in the
    # background epoch pipeline instead of as in-jit sorts/scatters on the
    # device (~10 ms cheaper per WN18-scale step). Bit-identical to the
    # traced builder (tests/test_dynamic_graph.py). Enabled on real local
    # TPU backends, where the per-epoch ~8 MB EdgeSet transfer rides PCIe.
    # On the tunneled 'axon' backend the in-jit build stays: measured
    # (interleaved A/B, 2 trials) the hosted step is 548-766 ms/epoch vs
    # 101 ms in-jit — the tunnel moves ~8 MB at ~20 MB/s, and even
    # worker-thread async device_put two epochs ahead cannot hide 400+ ms
    # transfers behind 60 ms steps. Override with host_graph_build.
    if host_graph_build is None:
        host_graph_build = (
            pallas_train_step and jax.default_backend() == "tpu"
        )

    # In-jit aggregation-layout row block, scaled to the subgraph like the
    # hosted path's enc_rb: at mega-node scale the rb=128 default leaves a
    # ceil(N/rb)*chunk block-minimum pad floor ~5x the subgraph's edges
    # (N=1M, B=100k: ~1M slots vs ~213k edges), paid by the gather, the
    # one-hot kernel AND the in-jit perm scatters — per step, since LP
    # rebuilds the graph every epoch. Static (host) value: shapes stay
    # epoch-independent.
    from rgcn_tpu.graph.dynamic import auto_layout_row_block as _auto_rb

    injit_row_block = _auto_rb(num_nodes, 2 * batch_size, chunk=tile_size)

    # structured negative scoring (3P+Ns query gathers instead of the
    # assembled batch's 3(P+Ns); see ops/pallas_distmult.py) — shared
    # predicate with the sharded driver
    structured_ok = cfg.structured_decoder_ok(pallas_train_step)

    def _jit_step(fn):
        if exe_cache_dir:
            from rgcn_tpu.utils.exe_cache import PinnedJit

            def _chain_runner(compiled, args):
                """Chained-diff seconds/step of a candidate executable.
                The step donates (params, opt_state) — measure on device
                COPIES so the trainer's originals survive the search."""
                import time as _time

                p0, o0 = args[0], args[1]
                rest = args[2:]

                def run(k):
                    p = jax.tree.map(jnp.copy, p0)
                    o = jax.tree.map(jnp.copy, o0)
                    best = None
                    for _ in range(2):
                        t0 = _time.perf_counter()
                        for _ in range(k):
                            p, o, loss = compiled(p, o, *rest)
                        float(loss)
                        dt = _time.perf_counter() - t0
                        best = dt if best is None else min(best, dt)
                    return best

                iters = 6
                return max((run(1 + iters) - run(1)) / iters, 1e-9)

            return PinnedJit(
                fn, exe_cache_dir, tag="lp_step", donate_argnums=(0, 1),
                search=exe_search, search_runner=_chain_runner,
            )
        return jax.jit(fn, donate_argnums=(0, 1))

    @_jit_step
    def step(params, opt_state, positives, edges, hosted, key):
        k_neg, k_drop, k_self, k_sl = jax.random.split(key, 4)
        structured = None
        if hosted is not None:
            # negatives (+ layouts for the scatter-free decoder backward)
            # precomputed in the background epoch pipeline
            labels, batch, batch_layouts, structured = hosted
        elif structured_ok:
            # fully in-jit epochs score structurally too — the LAYOUT-FREE
            # structured mode (plain-AD backward; in-jit layout builds
            # cost device sorts that outweigh the scatters they remove).
            # negative_structure's draws are bit-identical to
            # corrupt_batch's, so toggling host_graph_build keeps the
            # negative schedule.
            batch = batch_layouts = None
            ce_ij, ch_ij, labels = negative_structure(
                k_neg, positives, num_nodes, num_neg, head_prob
            )
            structured = (ch_ij, ce_ij, None)
        else:
            batch_layouts = None
            batch, labels = corrupt_batch(
                k_neg, positives, num_nodes, num_neg, head_prob
            )
        if edges is None:
            edges = build_edge_set_dynamic(
                positives,
                num_nodes,
                num_rels,
                tile_size=tile_size,
                dropout_rate=general_dropout,
                dropout_key=k_drop,
                with_dst_layout=pallas_train_step,
                row_block=injit_row_block,
            )
        if structural_self:
            self_mask = jax.random.bernoulli(
                k_self, self_keep_prob, (num_nodes, 1)
            ).astype(jnp.float32)
        else:
            self_mask = None

        if structured is not None:
            ch_, ce_, st_lays = structured
            bsz_total = labels.shape[0]
            want_pen = (
                cfg.decoder.l2_penalty > 0.0
                and cfg.decoder.l2_penalty_type == "schlichtkrull-l2"
            )
            pw = jnp.full(
                (bsz_total,),
                (1.0 / bsz_total) if want_pen else 0.0,
                jnp.float32,
            )

            def loss_fn(p):
                scores, penalty = model.apply(
                    p,
                    edges,
                    positives,
                    ch_, ce_, pw, st_lays,
                    method=model.structured_scores,
                    self_mask=self_mask,
                    deterministic=False,
                    rngs={"dropout": k_sl},
                )
                loss = optax.sigmoid_binary_cross_entropy(
                    scores, labels
                ).mean()
                return loss + cfg.decoder.l2_penalty * penalty
        else:
            def loss_fn(p):
                scores, penalty = model.apply(
                    p,
                    edges,
                    batch,
                    self_mask=self_mask,
                    deterministic=False,
                    rngs={"dropout": k_sl},
                    batch_layouts=batch_layouts,
                )
                loss = optax.sigmoid_binary_cross_entropy(
                    scores, labels
                ).mean()
                return loss + cfg.decoder.l2_penalty * penalty

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    # Static full-graph EdgeSet for evaluation (built once); the destination
    # layout turns on the Pallas aggregation path on TPU. Basis encoders
    # additionally get the coalesced-pair layout — the full graph carries
    # every reciprocal duplicate, so merging ~halves the encode's edge
    # stage (graph/coalesce.py; sampled per-epoch subgraphs rarely contain
    # both directions of a pair, so training graphs stay unmerged).
    from rgcn_tpu.graph.coalesce import merge_applicable

    merge_eval = enc.decomposition is not None and merge_applicable(
        2 * num_rels,
        decomposition=enc.decomposition.type,
        num_bases=enc.decomposition.num_bases,
    )
    # Static eval structures go to the device ONCE: jit re-transfers
    # numpy argument leaves per call, a host->device RPC per leaf on
    # tunneled backends (probe_amctx) — the eval encode was re-paying the
    # full-graph EdgeSet transfer on every check_every evaluation.
    eval_edges = jax.device_put(build_edge_set(
        train_np, num_nodes, num_rels, tile_size=tile_size,
        with_dst_layout=True, with_merged_layout=merge_eval,
    ))
    filters = (
        build_filters(test_np, data.all_triples, num_nodes)
        if cfg.evaluation.filtered
        else None
    )

    init_pos = jnp.asarray(train_np[:batch_size])
    params = model.init(
        {"params": jax.random.key(seed), "dropout": jax.random.key(seed + 1)},
        build_edge_set_dynamic(init_pos, num_nodes, num_rels, tile_size=tile_size),
        init_pos,
    )
    opt = cfg.training.optimiser
    tx = make_optimizer(opt.algorithm, opt.learn_rate, opt.weight_decay)
    opt_state = tx.init(params)

    epochs = max_epochs if max_epochs is not None else cfg.training.epochs
    # Epoch-indexed RNG (fold_in / per-epoch numpy seeds) so checkpoint
    # resume reproduces the exact key schedule of an uninterrupted run.
    base_key = jax.random.key(seed + 2)
    filtered_tag = "filtered" if cfg.evaluation.filtered else "raw"

    start_epoch = 1
    if checkpoint_dir:
        from rgcn_tpu.utils.checkpoint import restore_checkpoint

        restored, ck_step = restore_checkpoint(
            checkpoint_dir, {"params": params, "opt_state": opt_state}
        )
        if restored is not None:
            params = restored["params"]
            opt_state = restored["opt_state"]
            start_epoch = ck_step + 1
            logger.info(f"resumed from checkpoint at epoch {ck_step}")

    from rgcn_tpu.graph.dynamic import (
        auto_layout_row_block,
        build_edge_set_dynamic_host,
    )

    def sample_epoch(epoch):
        if batch_size >= len(train_np):
            positives = train_np
        else:
            positives = sampler(
                train_np, batch_size, np.random.default_rng((seed, epoch))
            )
        if not host_graph_build:
            return jnp.asarray(positives), None, None
        # row block scaled to the subgraph (small epochs over large node
        # sets drown in block-minimum layout padding at rb=128; measured
        # -20% on the WN18-scale encoder step at rb=512)
        enc_rb = auto_layout_row_block(num_nodes, 2 * len(positives))
        edges = build_edge_set_dynamic_host(
            positives, num_nodes, num_rels, tile_size=tile_size,
            dropout_rate=general_dropout,
            dropout_rng=np.random.default_rng((seed, epoch, 7)),
            with_dst_layout=True, row_block=enc_rb, layout_chunk=256,
        )
        # negatives + scoring layouts for the scatter-free decoder
        # backward (ops/pallas_distmult.py) — in-jit layout builds cost
        # device sorts that outweigh the scatters they remove
        batch, labels, ch_, ce_ = corrupt_batch_host(
            np.random.default_rng((seed, epoch, 11)),
            positives, num_nodes, num_neg, head_prob,
            return_structure=True,
        )
        if structured_ok:
            # sorted_corrupt: the corrupted-entity backward runs one
            # two-table weighted in-pipeline-gather aggregation in layout
            # order instead of materializing the (Ns, d) cotangent rows
            # (exact at f32, tests/test_basis.py). rb=512/ch=256 measured
            # best at WN18 scale — the default 320-row-block geometry
            # leaves the P-sized layouts ~73% padding
            # (benchmarks/probe_lp_step.py: 21.1 -> 19.7 ms full step).
            st_lays = build_structured_layouts(
                positives, ce_, num_nodes, row_block=512, chunk=256,
                sorted_corrupt=True, corrupt_head=ch_,
            )
            hosted = (labels, None, None, (ch_, ce_, st_lays))
        else:
            layouts = build_batch_layouts(batch, num_nodes)
            hosted = (labels, batch, layouts, None)
        # device_put from the worker thread: transfers are async and issue
        # 1-2 epochs ahead, so the host->device copy (which costs a full
        # network round trip on tunneled backends) overlaps with the
        # device executing earlier steps instead of serializing into the
        # epoch. This is what makes host_graph_build profitable on remote
        # backends, not just local-PCIe ones.
        return jax.device_put((jnp.asarray(positives), edges, hosted))

    # Background sampling pipeline: each epoch's subgraph is drawn by a
    # worker thread 1-2 epochs ahead while the device executes earlier
    # steps. Per-epoch RNG (seeded on (seed, epoch)) keeps the schedule
    # bit-identical to synchronous sampling regardless of thread timing.
    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(max_workers=1)
    prefetch_depth = 2
    pending = {}

    def get_positives(epoch):
        fut = pending.pop(epoch, None)
        out = fut.result() if fut is not None else sample_epoch(epoch)
        for e in range(epoch + 1, min(epoch + 1 + prefetch_depth, epochs + 1)):
            if e not in pending:
                pending[e] = pool.submit(sample_epoch, e)
        return out

    mrr, hits, ranks = 0.0, (0.0, 0.0, 0.0), np.array([])
    positives, epoch_edges, epoch_hosted = get_positives(start_epoch)
    for epoch in range(start_epoch, epochs + 1):
        t1 = time.time()
        sub = jax.random.fold_in(base_key, epoch)
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(positives), epoch_edges,
            epoch_hosted, sub
        )
        # the NEXT epoch's subgraph is (being) sampled AND built in the
        # background while the device executes this step; the loss fetch
        # is the sync point
        if epoch < epochs:
            positives, epoch_edges, epoch_hosted = get_positives(epoch + 1)
        loss = float(loss)
        t2 = time.time()

        ck_every = checkpoint_every or cfg.evaluation.check_every
        if checkpoint_dir and epoch % ck_every == 0:
            from rgcn_tpu.utils.checkpoint import save_checkpoint

            save_checkpoint(
                checkpoint_dir,
                {"params": params, "opt_state": opt_state},
                epoch,
            )

        if epoch % cfg.evaluation.check_every == 0 and epoch != epochs:
            logger.info("Starting evaluation...")
            mrr, hits, ranks = evaluate_link_predictor(
                model, params, eval_edges, test_np, filters,
                batch_size=cfg.evaluation.batch_size,
                verbose=cfg.evaluation.verbose, logger=logger,
                exe_cache_dir=exe_cache_dir,
            )
            logger.log_scalar("training.loss", loss, step=epoch)
            logger.log_scalar("test.mrr", mrr, step=epoch)
            for k, h in zip((1, 3, 10), hits):
                logger.log_scalar(f"test.hits_at_{k}", h, step=epoch)
            logger.info(
                f"[Epoch {epoch}] Loss: {loss:.5f} Step: {(t2 - t1):.3f}s "
                f"MRR({filtered_tag}): {mrr:.4f} "
                f"Hits@1: {hits[0]:.4f} Hits@3: {hits[1]:.4f} "
                f"Hits@10: {hits[2]:.4f}"
            )
        else:
            logger.log_scalar("training.loss", loss, step=epoch)
            logger.info(
                f"[Epoch {epoch}] Loss: {loss:.5f} Step: {(t2 - t1):.3f}s"
            )

    pool.shutdown(wait=False, cancel_futures=True)

    # final-state checkpoint: epochs is rarely a multiple of the save
    # cadence, and serving (cli/serve_links.py) loads the LATEST step —
    # without this, up to ck_every-1 epochs of training silently served
    # stale. Skipped when the in-loop cadence save just wrote this step.
    ck_every_f = checkpoint_every or cfg.evaluation.check_every
    if checkpoint_dir and epochs >= start_epoch and epochs % ck_every_f:
        from rgcn_tpu.utils.checkpoint import save_checkpoint

        save_checkpoint(
            checkpoint_dir, {"params": params, "opt_state": opt_state},
            epochs,
        )

    logger.info("Starting final evaluation...")
    mrr, hits, ranks = evaluate_link_predictor(
        model, params, eval_edges, test_np, filters,
        batch_size=cfg.evaluation.batch_size,
        verbose=cfg.evaluation.verbose, logger=logger,
        exe_cache_dir=exe_cache_dir,
    )
    logger.log_scalar("test.mrr", mrr, step=epochs)
    for k, h in zip((1, 3, 10), hits):
        logger.log_scalar(f"test.hits_at_{k}", h, step=epochs)
    logger.info(
        f"[Final Scores] Total Epoch {epochs} MRR({filtered_tag}): {mrr:.4f} "
        f"Hits@1: {hits[0]:.4f} Hits@3: {hits[1]:.4f} Hits@10: {hits[2]:.4f}"
    )
    return mrr, hits, ranks, params
