"""Weight/bias initializers with reference-compatible *distributions*.

The reference relies on torch's fan-in/fan-out conventions plus a custom
"Schlichtkrull" scheme (``/root/reference/torch_rgcn/utils.py:6-55``). We keep
the distributions (shapes of randomness), threaded through ``jax.random``
keys — parity with the reference is statistical, not stream-level.

Torch fan convention for an ``ndim >= 2`` tensor of shape ``(d0, d1, *rest)``:
``fan_in = d1 * prod(rest)``, ``fan_out = d0 * prod(rest)``.

Notes on reference defects deliberately not reproduced:

* ``schlichtkrull_uniform_`` passes a tensor where a shape tuple is expected
  (``utils.py:19-23``) and crashes on multi-element rows; here it derives the
  fan from the tensor shape like the normal variant.
* The LP layers call ``schlichtkrull_normal_`` without its required ``shape``
  argument for basis/plain weights and node embeddings
  (``torch_rgcn/layers.py:444-447``, ``models.py:55-56``), which raises a
  ``TypeError`` in the reference; here the fan again comes from the tensor
  shape. An explicit ``fan_shape`` override reproduces the block-path call
  that *does* pass a bespoke shape (``layers.py:429-436``).
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "torch_fans",
    "relu_gain",
    "schlichtkrull_std",
    "glorot_uniform",
    "glorot_normal",
    "schlichtkrull_normal",
    "schlichtkrull_uniform",
    "standard_normal",
    "standard_uniform",
    "uniform_symmetric",
    "kaiming_normal_fan_in",
    "torch_linear_weight",
    "torch_linear_bias",
    "select_weight_init",
    "select_bias_init",
]

Initializer = Callable[[jax.Array, Sequence[int], jnp.dtype], jax.Array]

RELU_GAIN = math.sqrt(2.0)


def relu_gain() -> float:
    return RELU_GAIN


def torch_fans(shape: Sequence[int]) -> Tuple[int, int]:
    """Torch's ``_calculate_fan_in_and_fan_out`` for ``ndim >= 2``."""
    if len(shape) < 2:
        raise ValueError("fan computation needs >= 2 dims")
    receptive = 1
    for d in shape[2:]:
        receptive *= d
    return shape[1] * receptive, shape[0] * receptive


def schlichtkrull_std(shape: Sequence[int], gain: float = 1.0) -> float:
    """``gain * 3 / sqrt(fan_in + fan_out)`` over ``shape[0], shape[1]``.

    Matches ``schlichtkrull_std`` (``torch_rgcn/utils.py:6-11``), which reads
    only the first two entries of the given shape.
    """
    return gain * 3.0 / math.sqrt(float(shape[0] + shape[1]))


def glorot_uniform(gain: float = 1.0) -> Initializer:
    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = torch_fans(shape)
        a = gain * math.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, dtype, minval=-a, maxval=a)

    return init


def glorot_normal(gain: float = 1.0) -> Initializer:
    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = torch_fans(shape)
        std = gain * math.sqrt(2.0 / (fan_in + fan_out))
        return std * jax.random.normal(key, shape, dtype)

    return init


def schlichtkrull_normal(
    gain: float = 1.0, fan_shape: Optional[Sequence[int]] = None
) -> Initializer:
    """N(0, std) with the Schlichtkrull std.

    ``fan_shape`` overrides the shape used for the std — the LP block path
    passes ``[(R'-1)//2, in_dim // num_blocks]`` explicitly
    (``torch_rgcn/layers.py:429,436``).
    """

    def init(key, shape, dtype=jnp.float32):
        std = schlichtkrull_std(fan_shape if fan_shape is not None else shape, gain)
        return std * jax.random.normal(key, shape, dtype)

    return init


def schlichtkrull_uniform(
    gain: float = 1.0, fan_shape: Optional[Sequence[int]] = None
) -> Initializer:
    def init(key, shape, dtype=jnp.float32):
        std = schlichtkrull_std(fan_shape if fan_shape is not None else shape, gain)
        return jax.random.uniform(key, shape, dtype, minval=-std, maxval=std)

    return init


def standard_normal(gain: float = 1.0) -> Initializer:
    """N(0, 1) — torch's ``nn.init.normal_`` defaults (gain is ignored,

    as the reference passes none when calling ``normal_``)."""
    del gain

    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype)

    return init


def standard_uniform(gain: float = 1.0) -> Initializer:
    """U(0, 1) — torch's ``nn.init.uniform_`` defaults."""
    del gain

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype)

    return init


def uniform_symmetric(bound: float) -> Initializer:
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def kaiming_normal_fan_in() -> Initializer:
    """Torch ``kaiming_normal_(mode='fan_in')`` with default leaky-relu gain

    ``sqrt(2)`` — used for e-RGCN node embeddings
    (``/root/reference/torch_rgcn/models.py:286``)."""

    def init(key, shape, dtype=jnp.float32):
        fan_in, _ = torch_fans(shape)
        std = math.sqrt(2.0 / fan_in)
        return std * jax.random.normal(key, shape, dtype)

    return init


def torch_linear_weight() -> Initializer:
    """Torch ``nn.Linear`` default weight init: kaiming-uniform(a=sqrt(5)),

    equivalent to U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for 2-D weights. Used by
    the c-RGCN bottleneck layers (``torch_rgcn/models.py:224-225``).
    Expects torch layout ``(out, in)`` fans; we store ``(in, out)`` so the fan
    is read from ``shape[0]``."""

    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[0]
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def torch_linear_bias(fan_in: int) -> Initializer:
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def select_weight_init(
    name: str,
    gain: float = 1.0,
    fan_shape: Optional[Sequence[int]] = None,
) -> Initializer:
    """Dispatch matching ``select_w_init`` (``torch_rgcn/utils.py:39-55``)."""
    name = (name or "").lower()
    if name in ("glorot-uniform", "xavier-uniform"):
        return glorot_uniform(gain)
    if name in ("glorot-normal", "xavier-normal"):
        return glorot_normal(gain)
    if name == "schlichtkrull-uniform":
        return schlichtkrull_uniform(gain, fan_shape)
    if name == "schlichtkrull-normal":
        return schlichtkrull_normal(gain, fan_shape)
    if name in ("normal", "standard-normal"):
        return standard_normal()
    if name == "uniform":
        return standard_uniform()
    raise NotImplementedError(f"{name!r} initialisation has not been implemented")


def select_bias_init(name) -> Initializer:
    """Dispatch matching ``select_b_init`` (``torch_rgcn/utils.py:25-37``)."""
    key_name = str(name).lower() if name is not None else None
    if key_name in ("zeros", "zero", "0"):
        return lambda key, shape, dtype=jnp.float32: jnp.zeros(shape, dtype)
    if key_name in ("ones", "one", "1"):
        return lambda key, shape, dtype=jnp.float32: jnp.ones(shape, dtype)
    if key_name == "uniform":
        return standard_uniform()
    if key_name == "normal":
        return standard_normal()
    raise NotImplementedError(f"{name!r} initialisation has not been implemented")
