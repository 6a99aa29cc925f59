"""Manual-AD collectives for differentiated ``shard_map`` regions.

Why this exists: Pallas kernels cannot run under ``check_vma=True`` —
``pallas_call`` out_shapes need explicit ``vma`` and interpret-mode kernel
evaluation rejects mixed varying/invariant operands inside the kernel body
(measured on jax 0.9; the CPU test suite runs every kernel in interpret
mode). With ``check_vma=False``, shard_map stops tracking which values vary
across the mesh, and plain ``lax.psum`` transposes to ``psum`` — gradients
w.r.t. replicated inputs silently come out wrong (off by a factor of the
axis size on some paths; found the hard way in round 1).

The fix is to make the replicated↔varying boundaries explicit with a
``custom_vjp`` pair whose backward rules are correct *by construction*
under ``check_vma=False``:

* :func:`all_reduce` — varying → replicated. Forward ``psum``; backward
  identity (the replicated cotangent is what every shard's local
  computation needs).
* :func:`fanout` — replicated → varying use. Forward identity; backward
  ``psum`` (a replicated value feeding every shard's local computation
  accumulates one cotangent contribution per shard).

Rule: inside a differentiated ``shard_map(check_vma=False)`` region, every
replicated value entering per-shard (varying) computation must pass through
:func:`fanout`, and every cross-shard reduction must be :func:`all_reduce`.
Purely replicated math (the dense self-loop path, the optimizer) needs
neither. :class:`~rgcn_tpu.nn.layers.RGCNConv` and
:class:`~rgcn_tpu.nn.layers.DistMult` apply this rule internally when
``axis_name`` is set; the training steps in :mod:`rgcn_tpu.dist.train`
close the loop at the loss level.

Do NOT mix these with ``check_vma=True`` regions: there the automatic vma
machinery inserts its own gradient reductions and the manual ``psum`` in
:func:`fanout`'s backward would double-count.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax

__all__ = ["all_reduce", "fanout", "maybe_all_reduce", "maybe_fanout"]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def all_reduce(x: jax.Array, axis_name: str) -> jax.Array:
    """``psum`` whose transpose is the identity (varying → replicated)."""
    return jax.lax.psum(x, axis_name)


def _all_reduce_fwd(x, axis_name):
    return jax.lax.psum(x, axis_name), None


def _all_reduce_bwd(axis_name, _res, g):
    return (g,)


all_reduce.defvjp(_all_reduce_fwd, _all_reduce_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def fanout(x: jax.Array, axis_name: str) -> jax.Array:
    """Identity whose transpose is ``psum`` (replicated value entering
    per-shard computation; the true cotangent is the sum of all shards'
    local contributions)."""
    return x


def _fanout_fwd(x, axis_name):
    return x, None


def _fanout_bwd(axis_name, _res, g):
    return (jax.lax.psum(g, axis_name),)


fanout.defvjp(_fanout_fwd, _fanout_bwd)


def maybe_all_reduce(x: jax.Array, axis_name: Optional[str]) -> jax.Array:
    return all_reduce(x, axis_name) if axis_name is not None else x


def maybe_fanout(x: jax.Array, axis_name: Optional[str]) -> jax.Array:
    return fanout(x, axis_name) if axis_name is not None else x
