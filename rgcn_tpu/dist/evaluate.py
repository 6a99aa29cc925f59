"""Mesh-sharded filtered-ranking evaluation.

The candidate sweep is the evaluation hot loop: ``(B, d) @ (d, N)`` scores
over every entity, per direction (reference ``utils/misc.py:60-110``
re-encoded the whole graph per 16-triple batch; the single-device redesign
in :mod:`rgcn_tpu.train.evaluate` encodes once and scans batches). At
fb15k-237-and-beyond scale the ``(B, N)`` score matrix and its ``N``-wide
reductions dominate — here they are sharded over the mesh:

* every shard holds the replicated query embeddings and scores its own
  ``N / K`` candidate column slice;
* the filtered -inf scatter applies only to filter indices falling in the
  shard's slice;
* the true-triple score is recovered with a ``pmax`` (the target column
  lives on exactly one shard; filters never contain the target);
* rank counts (``#scores > true``, ties) are ``psum``-reduced scalars per
  row.

Numerically exact vs the single-device path (``tests/test_dist.py``);
forward-only, so vma checking stays on shard_map's default.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from rgcn_tpu.dist.mesh import EDGE_AXIS
from rgcn_tpu.train.evaluate import batched_eval_arrays, ranking_metrics

__all__ = ["make_sharded_rank_sweep", "evaluate_link_predictor_sharded"]

_BIG = 2**30


def _wrap_pinned(fn, exe_cache_dir: Optional[str], tag: str, mesh: Mesh):
    """``jax.jit`` with cross-process executable pinning when requested —
    the eval twin of :func:`rgcn_tpu.dist.driver._pin_sharded`.
    Multi-process jobs pin per process (keyed by process index, bound by
    global device id — see exe_cache)."""
    if not exe_cache_dir:
        return jax.jit(fn)
    from rgcn_tpu.utils.exe_cache import PinnedJit

    return PinnedJit(
        fn, exe_cache_dir, tag=tag, devices=list(mesh.devices.flat)
    )


def make_sharded_rank_sweep(model, method, mesh: Mesh, axis: str = EDGE_AXIS,
                            exe_cache_dir: Optional[str] = None,
                            tag: str = "sharded_rank_sweep"):
    """Jitted sharded rank sweep for one direction.

    ``method`` is ``model.score_heads`` / ``model.score_tails`` — it must
    accept ``(batch, z)`` and produce candidate scores whose LAST axis is
    the entity axis; the shard computes it against a column slice of the
    *candidate* embeddings by passing a sliced ``z`` (DistMult scores
    candidates with ``q @ z_cand.T``, so slicing ``z`` slices candidates).
    Queries index the replicated full ``z``.
    """
    k = mesh.shape[axis]

    def sweep(params, z, batches, filts, tgts, valids):
        n = z.shape[0]
        shard_n = -(-n // k)
        n_pad = shard_n * k
        z_pad = jnp.pad(z, ((0, n_pad - n), (0, 0)))

        @functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(), P()),
            out_specs=P(),
        )
        def run(params, z_pad, batches, filts, tgts, valids):
            me = jax.lax.axis_index(axis)
            lo = me * shard_n
            z_local = jax.lax.dynamic_slice_in_dim(z_pad, lo, shard_n, 0)

            def body(carry, xs):
                batch, filt, tgt, valid = xs
                bsz = batch.shape[0]
                rows = jnp.arange(bsz)[:, None]
                # local candidate scores against full queries: the scorer
                # sees a z whose candidate rows are the local slice but
                # whose query gathers must hit the full table — DistMult
                # separates them (queries via batch indices into z_full).
                scores = model.apply(
                    params, batch, z_pad, method=method,
                    candidate_slice=(lo, shard_n),
                )  # (B, shard_n)
                # out-of-range global candidate columns (N padding) -> -inf
                gcol = lo + jnp.arange(shard_n)[None, :]
                scores = jnp.where(gcol < n, scores, -jnp.inf)
                # filters within this shard's slice
                in_shard = (filt >= lo) & (filt < lo + shard_n)
                fl = jnp.where(in_shard, filt - lo, _BIG)
                scores = scores.at[rows, fl].set(-jnp.inf, mode="drop")
                # true score lives on exactly one shard
                t_ok = (tgt >= lo) & (tgt < lo + shard_n)
                t_loc = jnp.clip(tgt - lo, 0, shard_n - 1)
                true_local = jnp.where(
                    t_ok, scores[jnp.arange(bsz), t_loc], -jnp.inf
                )
                true = jax.lax.pmax(true_local, axis)
                raw = jax.lax.psum(
                    jnp.sum(scores > true[:, None], axis=1), axis
                )
                ties = jax.lax.psum(
                    jnp.sum(scores == true[:, None], axis=1), axis
                )
                ranks = raw + (ties - 1) // 2 + 1
                return carry, jnp.where(valid, ranks, 0)

            _, ranks = jax.lax.scan(
                body, None, (batches, filts, tgts, valids)
            )
            return ranks

        return run(params, z_pad, batches, filts, tgts, valids)

    return _wrap_pinned(sweep, exe_cache_dir, tag, mesh)


def evaluate_link_predictor_sharded(
    model,
    params,
    eval_edges,
    test: np.ndarray,
    filters,
    mesh: Mesh,
    batch_size: int = 512,
    axis: str = EDGE_AXIS,
    exe_cache_dir: Optional[str] = None,
) -> Tuple[float, Tuple[float, float, float], np.ndarray]:
    """Sharded filtered/raw MRR and Hits@{1,3,10} (head + tail).

    ``exe_cache_dir`` pins the compiled encode/sweep programs across
    processes (single-process meshes; see :func:`_wrap_pinned`)."""
    num_test = len(test)
    encode = _wrap_pinned(
        lambda p, e: model.apply(p, e, method=model.encode),
        exe_cache_dir, "sharded_eval_encode", mesh,
    )
    z = encode(params, eval_edges)

    if filters is not None:
        head_filt, tail_filt = filters.heads, filters.tails
    else:
        head_filt = np.full((num_test, 1), _BIG, dtype=np.int32)
        tail_filt = head_filt

    ranks = []
    for method, filt, tgt, tag in (
        (model.score_heads, head_filt, test[:, 0], "sharded_rank_h"),
        (model.score_tails, tail_filt, test[:, 2], "sharded_rank_t"),
    ):
        sweep = make_sharded_rank_sweep(
            model, method, mesh, axis,
            exe_cache_dir=exe_cache_dir, tag=tag,
        )
        arrays = batched_eval_arrays(test, filt, tgt, batch_size)
        r = np.asarray(
            sweep(params, z, *(jnp.asarray(a) for a in arrays))
        ).reshape(-1)[:num_test]
        ranks.append(r)

    ranks = np.concatenate(ranks)
    mrr, hits = ranking_metrics(ranks)
    return mrr, hits, ranks
