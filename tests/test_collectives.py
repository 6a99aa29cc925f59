"""Unit contract of the manual-AD collectives (ops/collectives.py):
gradients through shard_map(check_vma=False) regions are exact when every
varying→replicated reduction is all_reduce and every replicated value
entering per-shard computation is fanout-marked."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from rgcn_tpu.ops.collectives import all_reduce, fanout

N_DEV = 8


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < N_DEV:
        pytest.skip("needs 8 virtual devices")
    return jax.make_mesh((N_DEV,), ("edge",))


def test_two_layer_chain_grads_exact(mesh):
    """Replicated parameter used on BOTH a varying path (through fanout /
    all_reduce) and a purely replicated path — the shape of every RGCN
    layer. Gradient must equal the single-device computation."""
    x = jnp.arange(64, dtype=jnp.float32)
    w = jnp.asarray(3.0)

    def loss_single(w):
        h = jnp.sum(x * w)  # "aggregation"
        return h * w + w * w  # replicated math + direct use

    want_l = loss_single(w)
    want_g = jax.grad(loss_single)(w)

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(P(), P("edge")),
        out_specs=(P(), P()), check_vma=False,
    )
    def sharded(w, xs):
        def loss(w):
            h = all_reduce(jnp.sum(xs * fanout(w, "edge")), "edge")
            return h * w + w * w

        return jax.value_and_grad(loss)(w)

    got_l, got_g = sharded(w, x)
    np.testing.assert_allclose(float(got_l), float(want_l), rtol=1e-6)
    np.testing.assert_allclose(float(got_g), float(want_g), rtol=1e-6)


def test_fanout_per_use_granularity(mesh):
    """Two independent varying uses of one replicated value each get their
    own fanout; cotangents add up to the single-device gradient."""
    x = jnp.arange(64, dtype=jnp.float32)
    y = jnp.arange(64, dtype=jnp.float32) * 0.5
    w = jnp.asarray(2.0)

    def loss_single(w):
        return jnp.sum(x * w) + jnp.sum(y * (w ** 2))

    want_g = jax.grad(loss_single)(w)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P("edge"), P("edge")), out_specs=P(),
        check_vma=False,
    )
    def sharded(w, xs, ys):
        def loss(w):
            a = all_reduce(jnp.sum(xs * fanout(w, "edge")), "edge")
            b = all_reduce(jnp.sum(ys * fanout(w, "edge") ** 2), "edge")
            return a + b

        return jax.grad(loss)(w)

    np.testing.assert_allclose(float(sharded(w, x, y)), float(want_g),
                               rtol=1e-6)


def test_all_reduce_tuple_axes(mesh2d=None):
    """all_reduce accepts axis tuples (the 2-D replica x edge loss
    reduction)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = jax.make_mesh((2, 4), ("replica", "edge"))
    x = jnp.arange(64, dtype=jnp.float32)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(("replica", "edge")),), out_specs=P(),
        check_vma=False,
    )
    def f(xs):
        return all_reduce(jnp.sum(xs), ("replica", "edge"))

    np.testing.assert_allclose(float(f(x)), float(x.sum()), rtol=1e-6)
