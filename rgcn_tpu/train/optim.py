"""Optimizer factory with torch-compatible semantics.

The reference supports adam / adamw / adagrad / sgd with a ``weight_decay``
knob (``/root/reference/experiments/classify_nodes.py:85-98``,
``predict_links.py:94-109``). Torch's non-AdamW ``weight_decay`` adds
``wd * param`` to the *gradient* before the moment update; that composes in
optax as ``add_decayed_weights`` placed before the scaling transform.
Adagrad matches torch's defaults (zero initial accumulator, eps 1e-10)
rather than optax's.
"""

from __future__ import annotations

import optax

__all__ = ["make_optimizer"]


def make_optimizer(
    algorithm: str, learn_rate: float, weight_decay: float = 0.0
) -> optax.GradientTransformation:
    algorithm = algorithm.lower()
    if algorithm == "adam":
        core = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
    elif algorithm == "adamw":
        return optax.adamw(
            learn_rate, b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay
        )
    elif algorithm == "adagrad":
        core = optax.scale_by_rss(initial_accumulator_value=0.0, eps=1e-10)
    elif algorithm == "sgd":
        core = optax.identity()
    else:
        raise NotImplementedError(
            f"{algorithm!r} optimiser has not been implemented"
        )

    steps = []
    if weight_decay:
        steps.append(optax.add_decayed_weights(weight_decay))
    steps.append(core)
    steps.append(optax.scale(-learn_rate))
    return optax.chain(*steps)
