"""Initializer distribution parity vs torch (fans, bounds, std).

Parity is statistical (same distributions, not same streams) — these tests
pin the fan conventions and scale factors against torch's own initializers
on large tensors.
"""

import jax
import numpy as np
import pytest

from rgcn_tpu.nn import init as rinit

torch = pytest.importorskip("torch")


def _stats(key, init, shape):
    x = np.asarray(init(jax.random.key(key), shape))
    return x.mean(), x.std(), x.min(), x.max()


def test_glorot_uniform_bounds_match_torch():
    shape = (37, 64, 32)  # 3-D: torch fan_in = 64*32, fan_out = 37*32
    t = torch.empty(shape)
    torch.nn.init.xavier_uniform_(t, gain=float(np.sqrt(2.0)))
    bound_torch = float(t.abs().max())

    _, _, lo, hi = _stats(0, rinit.glorot_uniform(rinit.relu_gain()), shape)
    expected = np.sqrt(2.0) * np.sqrt(6.0 / (64 * 32 + 37 * 32))
    assert abs(hi - expected) / expected < 0.01
    assert abs(-lo - expected) / expected < 0.01
    assert abs(bound_torch - expected) / expected < 0.01  # same convention


def test_glorot_normal_std_matches_torch():
    shape = (50, 80)
    t = torch.empty(shape)
    torch.nn.init.xavier_normal_(t)
    _, std, _, _ = _stats(1, rinit.glorot_normal(), shape)
    expected = np.sqrt(2.0 / (80 + 50))
    assert abs(std - expected) / expected < 0.05
    assert abs(float(t.std()) - expected) / expected < 0.1


def test_schlichtkrull_std_formula():
    # std = gain * 3 / sqrt(shape[0] + shape[1])  (utils.py:6-11)
    shape = (100, 200)
    _, std, _, _ = _stats(2, rinit.schlichtkrull_normal(), shape)
    expected = 3.0 / np.sqrt(300)
    assert abs(std - expected) / expected < 0.05
    # fan override (the LP block path's bespoke shape, layers.py:429)
    _, std2, _, _ = _stats(
        3, rinit.schlichtkrull_normal(fan_shape=(4, 10)), (64, 64)
    )
    expected2 = 3.0 / np.sqrt(14)
    assert abs(std2 - expected2) / expected2 < 0.05


def test_kaiming_matches_torch_convention():
    shape = (500, 32)  # (N, nemb): torch fan_in = 32
    t = torch.empty(shape)
    torch.nn.init.kaiming_normal_(t, mode="fan_in")
    _, std, _, _ = _stats(4, rinit.kaiming_normal_fan_in(), shape)
    expected = np.sqrt(2.0 / 32)
    assert abs(std - expected) / expected < 0.05
    assert abs(float(t.std()) - expected) / expected < 0.1


def test_torch_linear_defaults():
    din, dout = 128, 64
    ref = torch.nn.Linear(din, dout)
    wb = float(ref.weight.abs().max())
    _, _, lo, hi = _stats(5, rinit.torch_linear_weight(), (din, dout))
    expected = 1.0 / np.sqrt(din)
    assert abs(hi - expected) / expected < 0.02
    assert abs(wb - expected) / expected < 0.05
    _, _, blo, bhi = _stats(6, rinit.torch_linear_bias(din), (dout,))
    assert -expected <= blo and bhi <= expected


def test_standard_inits():
    _, std, lo, hi = _stats(7, rinit.standard_normal(), (300, 300))
    assert abs(std - 1.0) < 0.02
    _, _, lo, hi = _stats(8, rinit.standard_uniform(), (300, 300))
    assert 0.0 <= lo and hi <= 1.0  # torch uniform_ default is U(0, 1)


def test_unknown_inits_raise():
    with pytest.raises(NotImplementedError):
        rinit.select_weight_init("nope")
    with pytest.raises(NotImplementedError):
        rinit.select_bias_init("nope")
    # reference-compatible aliases
    assert rinit.select_weight_init("xavier-uniform")
    assert rinit.select_bias_init("zeros")
    assert rinit.select_bias_init("ones")
