"""Node-classification training driver.

Reference: ``/root/reference/experiments/classify_nodes.py``. The epoch
structure (full-batch CE on the train nodes, optional L2 on first-layer
weights and node embeddings, per-epoch train/test accuracy, ``repeats`` with
mean ± standard error) is preserved; the execution model is redesigned:

* one ``jit``-compiled update step (loss + grad + optimizer) per epoch —
  the reference pays Python dispatch per op and rebuilds its sparse
  adjacency three times per epoch;
* one extra forward for post-update evaluation (the reference runs two,
  ``classify_nodes.py:136-139`` — train and test accuracy come from the
  same logits here).
"""

from __future__ import annotations

import statistics
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rgcn_tpu.config import NodeClassificationExperiment
from rgcn_tpu.data.loaders import NodeClassificationData
from rgcn_tpu.graph.structure import build_edge_set
from rgcn_tpu.models import EmbeddingNodeClassifier, NodeClassifier
from rgcn_tpu.train.evaluate import accuracy
from rgcn_tpu.train.optim import make_optimizer
from rgcn_tpu.utils.logging import ScalarLogger

__all__ = ["build_nc_model", "train_node_classifier", "run_repeats"]


def build_nc_model(
    cfg: NodeClassificationExperiment,
    data: NodeClassificationData,
    axis_name: str = None,
    backend: str = "auto",
):
    rg = cfg.rgcn
    decomp = rg.decomposition
    common = dict(
        num_nodes=data.num_nodes,
        num_relations=data.num_relations,
        num_classes=data.num_classes,
        decomposition=decomp.type if decomp else None,
        num_bases=decomp.num_bases if decomp else 0,
        num_blocks=decomp.num_blocks if decomp else 0,
        axis_name=axis_name,
        backend=backend,
    )
    if rg.model == "rgcn":
        return NodeClassifier(
            hidden_size=rg.hidden_size, num_layers=rg.num_layers, **common
        )
    if rg.model == "e-rgcn":
        return EmbeddingNodeClassifier(emb_dim=rg.node_embeddings, **common)
    raise NotImplementedError(f"{rg.model!r} model has not been implemented")


def train_node_classifier(
    cfg: NodeClassificationExperiment,
    data: NodeClassificationData,
    seed: int = 0,
    logger: Optional[ScalarLogger] = None,
    tile_size: int = 128,
    log_suffix: str = "",
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: Optional[int] = None,
    exe_cache_dir: Optional[str] = None,
    exe_search: int = 0,
) -> float:
    """Train one model; returns final test accuracy (percent).

    ``exe_cache_dir`` pins the compiled train/predict executables across
    processes (:class:`rgcn_tpu.utils.exe_cache.PinnedJit`, keyed by the
    lowered HLO hash): on this environment's remote-compile backend a
    fresh AM-scale NC step costs 60-570 s to compile per process AND
    re-rolls a compile-draw lottery whose long-chain truth spreads ~2x
    (STATUS round 7); a pinned run re-traces in seconds and reuses the
    exact prior executable. Off by default (plain ``jax.jit``).
    """
    logger = logger or ScalarLogger()
    rg = cfg.rgcn

    # with_dst_layout enables the fully-Pallas SpMM (auto-selected on TPU;
    # the featureful layers train through its custom VJP). Diag (e-RGCN)
    # and small-basis layers additionally ride the coalesced-pair layout
    # when the relation vocabulary admits it — NC trains full-batch on the
    # full graph, which carries every parallel-edge duplicate
    # (graph/coalesce.py; the featureless first layer and wide-basis /
    # dense paths ignore the merged layout).
    from rgcn_tpu.graph.coalesce import merge_applicable

    decomp = rg.decomposition
    merge_ok = merge_applicable(
        2 * data.num_relations,
        decomposition=decomp.type if decomp else None,
        num_bases=decomp.num_bases if decomp else 0,
        diag=rg.model == "e-rgcn",
    )
    # Unique-(src, rel) pair index for the featureless many-basis first
    # layer (AM: 40 bases): parallel edges contract once per pair
    # (ops/spmm.py). Small-basis configs ride the aggregation-first
    # Pallas kernel instead (nn/layers.py, nb <= 8).
    pair_ok = (
        rg.model == "rgcn"
        and decomp is not None
        and decomp.type == "basis"
        and decomp.num_bases > 8
    )
    from rgcn_tpu.graph.structure import auto_nc_row_block

    # with_pair_agg: the composed pair aggregation (scatter-free d_m
    # backward) HALVES the AM-scale step — 219.8 vs 432.8 ms interleaved,
    # forward 87.9 vs 92.8 (probe_stress_nc --ab pairs,agg post-
    # device_put). Its round-7 "2.3x slower forward" verdict was per-step
    # numpy transfer contamination (the composed path carries ~20 MB more
    # index arrays, which the pre-fix probe re-transferred every call).
    edges = build_edge_set(
        data.triples, data.num_nodes, data.num_relations, tile_size=tile_size,
        with_dst_layout=True, with_merged_layout=merge_ok,
        with_pair_index=pair_ok, with_pair_agg=pair_ok,
        layout_row_block=auto_nc_row_block(data.num_nodes),
    )
    # Move the static EdgeSet to the device ONCE. jit re-transfers numpy
    # argument leaves on EVERY call, and on the tunneled backend that is
    # a host->device RPC per epoch per used leaf (~80-100 MB/s measured):
    # at AM scale the step was paying 300-500 ms/epoch of transfers that
    # masqueraded as device time for three rounds (probe_amctx — every
    # in-program "slow gather" was the transfer of its own index/value
    # arrays; the isolated gathers were always fast).
    edges = jax.device_put(edges)
    train_idx_np, train_lbl_np = data.index_labels(data.train)
    test_idx_np, test_lbl_np = data.index_labels(data.test)
    train_idx = jnp.asarray(train_idx_np)
    train_lbl = jnp.asarray(train_lbl_np)

    model = build_nc_model(cfg, data)
    params = model.init(jax.random.key(seed), edges)
    opt = cfg.training.optimiser
    tx = make_optimizer(opt.algorithm, opt.learn_rate, opt.weight_decay)
    opt_state = tx.init(params)

    l1_pen = rg.layer1_l2_penalty
    emb_pen = rg.node_embedding_l2_penalty
    if emb_pen > 0.0 and rg.model != "e-rgcn":
        raise ValueError(
            f"cannot apply L2-regularisation on node embeddings for "
            f"{rg.model} model"
        )

    def _step(params, opt_state, edges):
        def loss_fn(p):
            logits = model.apply(p, edges)
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits[train_idx], train_lbl
            ).mean()
            if l1_pen > 0.0:
                loss = loss + l1_pen * model.layer1_l2(p)
            if emb_pen > 0.0:
                loss = loss + emb_pen * model.embedding_l2(p)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def _predict(params, edges):
        return jnp.argmax(model.apply(params, edges), axis=-1)

    if exe_cache_dir:
        from rgcn_tpu.utils.exe_cache import PinnedJit

        def _chain_runner(compiled, args):
            """Chained-diff seconds/step of a candidate step executable
            (fetching the loss scalar is the only reliable sync on the
            tunneled backend; differencing two chain lengths cancels the
            constant RPC cost)."""
            p0, o0, e0 = args

            def run(k):
                p, o = p0, o0
                best = None
                for _ in range(2):
                    t0 = time.perf_counter()
                    for _ in range(k):
                        p, o, loss = compiled(p, o, e0)
                    float(loss)
                    dt = time.perf_counter() - t0
                    best = dt if best is None else min(best, dt)
                return best

            iters = 4
            return max((run(1 + iters) - run(1)) / iters, 1e-9)

        # constant tags: the HLO hash is the identity — repeats (and
        # fresh processes) share one pinned executable
        step = PinnedJit(
            _step, exe_cache_dir, tag="nc_step",
            search=exe_search, search_runner=_chain_runner,
        )
        predict = PinnedJit(_predict, exe_cache_dir, tag="nc_predict")
    else:
        step = jax.jit(_step)
        predict = jax.jit(_predict)

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

    epochs = cfg.training.epochs
    for epoch in range(start_epoch, epochs + 1):
        t1 = time.time()
        params, opt_state, loss = step(params, opt_state, edges)
        loss = float(loss)
        t2 = time.time()

        pred = np.asarray(predict(params, edges))
        train_acc = accuracy(pred[train_idx_np], train_lbl_np)
        test_acc = accuracy(pred[test_idx_np], test_lbl_np)
        t3 = time.time()

        logger.log_scalar(f"training.loss{log_suffix}", loss, step=epoch)
        logger.log_scalar(f"training.accuracy{log_suffix}", train_acc, step=epoch)
        logger.log_scalar(f"test.accuracy{log_suffix}", test_acc, step=epoch)
        logger.info(
            f"[Epoch {epoch}] Loss: {loss:.5f} Step: {(t2 - t1):.3f}s "
            f"Eval: {(t3 - t2):.3f}s Train Accuracy: {train_acc:.2f} "
            f"Test Accuracy: {test_acc:.2f}"
        )

        if checkpoint_dir and epoch % (checkpoint_every or 10) == 0:
            from rgcn_tpu.utils.checkpoint import save_checkpoint

            save_checkpoint(
                checkpoint_dir,
                {"params": params, "opt_state": opt_state},
                epoch,
            )

    # Skip the final save when a resumed run already sits past the target
    # epoch count — writing later-step params into step_{epochs} would
    # mislabel the checkpoint (mirrors the LP driver's guard) — and when
    # the in-loop cadence save just wrote this exact step.
    if checkpoint_dir and epochs >= start_epoch and \
            epochs % (checkpoint_every or 10):
        from rgcn_tpu.utils.checkpoint import save_checkpoint

        save_checkpoint(
            checkpoint_dir,
            {"params": params, "opt_state": opt_state},
            epochs,
        )

    pred = np.asarray(predict(params, edges))
    test_acc = accuracy(pred[test_idx_np], test_lbl_np)
    logger.log_scalar(f"test.accuracy{log_suffix}", test_acc)
    logger.info(f"[Evaluation] Test Accuracy: {test_acc:.2f}")
    return test_acc


def run_repeats(
    cfg: NodeClassificationExperiment,
    data: NodeClassificationData,
    logger: Optional[ScalarLogger] = None,
    tile_size: int = 128,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: Optional[int] = None,
    exe_cache_dir: Optional[str] = None,
    exe_search: int = 0,
) -> Tuple[float, float]:
    """Repeat training and report mean ± standard error
    (``classify_nodes.py:159-178``)."""
    import os

    logger = logger or ScalarLogger()
    accs = []
    for i in range(1, cfg.repeats + 1):
        ck = (
            os.path.join(checkpoint_dir, f"repeat_{i}")
            if checkpoint_dir and cfg.repeats > 1
            else checkpoint_dir
        )
        accs.append(
            train_node_classifier(
                cfg, data, seed=i, logger=logger, tile_size=tile_size,
                log_suffix=f"_{i}", checkpoint_dir=ck,
                checkpoint_every=checkpoint_every,
                exe_cache_dir=exe_cache_dir, exe_search=exe_search,
            )
        )
    avg = sum(accs) / len(accs)
    std = statistics.stdev(accs) if len(accs) > 1 else 0.0
    ste = std / (len(accs) ** 0.5)
    logger.log_scalar("test.accuracy", round(avg, 2))
    logger.log_scalar("test.accuracy_ste", round(ste, 2))
    logger.info(
        f"[Summary] Test Accuracy: {avg:.2f} -/+ {ste:.2f}"
        + (f" ({cfg.repeats} runs)" if cfg.repeats > 1 else "")
    )
    return avg, ste
