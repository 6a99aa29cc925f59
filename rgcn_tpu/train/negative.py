"""In-jit negative sampling for link prediction.

Reference: ``/root/reference/utils/misc.py:174-189`` — each positive triple
is repeated ``ns`` times; per copy a Bernoulli(``head_prob``) coin decides
whether the head or the tail is replaced by a uniform-random entity. No
false-negative filtering (faithful to the reference). Runs inside the jitted
train step with threaded PRNG keys instead of torch's global RNG.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["negative_sampling", "negative_structure", "corrupt_batch"]


def negative_sampling(
    key: jax.Array,
    positives: jax.Array,
    num_nodes: int,
    num_negatives: int,
    head_prob: float,
) -> jax.Array:
    """Return ``(B * ns, 3)`` corrupted triples for ``(B, 3)`` positives."""
    bsz = positives.shape[0]
    k_ent, k_side = jax.random.split(key)
    expanded = jnp.repeat(positives, num_negatives, axis=0)  # (B*ns, 3)
    corruptions = jax.random.randint(
        k_ent, (bsz * num_negatives,), 0, num_nodes, dtype=positives.dtype
    )
    corrupt_head = jax.random.bernoulli(
        k_side, head_prob, (bsz * num_negatives,)
    )
    s = jnp.where(corrupt_head, corruptions, expanded[:, 0])
    o = jnp.where(corrupt_head, expanded[:, 2], corruptions)
    return jnp.stack([s, expanded[:, 1], o], axis=1)


def negative_structure(
    key: jax.Array,
    positives: jax.Array,
    num_nodes: int,
    num_negatives: int,
    head_prob: float,
):
    """The corruption STRUCTURE of :func:`negative_sampling` without
    materializing the corrupted triples: ``(corrupt_ent (B*ns,),
    corrupt_head (B*ns,) bool, labels (B + B*ns,))``, negatives
    parent-major. Key usage (split + draw shapes) matches
    :func:`negative_sampling` exactly, so the drawn corruptions are
    bit-identical — feeds the structured scorer
    (ops/pallas_distmult.py::distmult_structured_agg_ad), which gathers
    3P + Ns query rows instead of the assembled batch's 3(P + Ns)."""
    bsz = positives.shape[0]
    k_ent, k_side = jax.random.split(key)
    corrupt_ent = jax.random.randint(
        k_ent, (bsz * num_negatives,), 0, num_nodes, dtype=positives.dtype
    )
    corrupt_head = jax.random.bernoulli(
        k_side, head_prob, (bsz * num_negatives,)
    )
    labels = jnp.concatenate(
        [
            jnp.ones((bsz,), jnp.float32),
            jnp.zeros((bsz * num_negatives,), jnp.float32),
        ]
    )
    return corrupt_ent, corrupt_head, labels


def corrupt_batch(
    key: jax.Array,
    positives: jax.Array,
    num_nodes: int,
    num_negatives: int,
    head_prob: float,
):
    """Positives ∥ negatives plus binary labels (1=positive, 0=negative),

    matching the batch assembly in ``experiments/predict_links.py:133-140``.
    """
    negatives = negative_sampling(
        key, positives, num_nodes, num_negatives, head_prob
    )
    batch = jnp.concatenate([positives, negatives], axis=0)
    labels = jnp.concatenate(
        [
            jnp.ones((positives.shape[0],), jnp.float32),
            jnp.zeros((negatives.shape[0],), jnp.float32),
        ]
    )
    return batch, labels


def corrupt_batch_host(
    rng,
    positives,
    num_nodes: int,
    num_negatives: int,
    head_prob: float,
    return_structure: bool = False,
    structure_only: bool = False,
):
    """Host (NumPy) mirror of :func:`corrupt_batch` for the background
    epoch pipeline: drawing the negatives on host lets the pipeline also
    precompute the scoring batch's subject/object aggregation layouts for
    the scatter-free decoder backward (ops/pallas_distmult.py) — building
    those in-jit costs device sorts that outweigh the scatter they remove.
    Same process (repeat ns times, Bernoulli head/tail, uniform entity),
    host RNG stream.

    ``structure_only=True`` returns just ``(corrupt_head, corrupt_ent)``
    without assembling the batch/labels arrays — the structured scoring
    paths rebuild neither, and the assembly is ~8 MB of dead host work
    per epoch at WN18 scale. Draws the SAME rng stream as the full form.
    """
    import numpy as np

    positives = np.asarray(positives)
    bsz = positives.shape[0]
    corruptions = rng.integers(
        0, num_nodes, bsz * num_negatives
    ).astype(positives.dtype)
    corrupt_head = rng.random(bsz * num_negatives) < head_prob
    if structure_only:
        return corrupt_head, corruptions
    expanded = np.repeat(positives, num_negatives, axis=0)
    s = np.where(corrupt_head, corruptions, expanded[:, 0])
    o = np.where(corrupt_head, expanded[:, 2], corruptions)
    negatives = np.stack([s, expanded[:, 1], o], axis=1)
    batch = np.concatenate([positives, negatives], axis=0)
    labels = np.concatenate(
        [
            np.ones(bsz, dtype=np.float32),
            np.zeros(len(negatives), dtype=np.float32),
        ]
    )
    if return_structure:
        return batch, labels, corrupt_head, corruptions
    return batch, labels
