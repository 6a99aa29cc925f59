"""Checkpoint / resume for sharded (multi-chip / multi-host) training.

Parameters and optimizer state are *replicated* over the mesh in this
framework's sharding layout (edge partitioning scales the graph, not the
weights — see :mod:`rgcn_tpu.dist.train`), so distributed checkpointing
reduces to:

* **save**: pull the local replica of every leaf to host memory
  (``jax.Array.addressable_data(0)`` — each process holds a full copy of a
  replicated array) and let **process 0 alone** write through the
  single-device checkpoint layer (:mod:`rgcn_tpu.utils.checkpoint`);
* **restore**: every process reads the same files into a host pytree; the
  jitted sharded step re-replicates on first use, exactly like the
  freshly-initialized state. Multi-host runs therefore need the checkpoint
  directory on a filesystem all hosts can read (the standard pod setup).

The reference has no persistence at all (SURVEY §5), let alone a
distributed story.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import numpy as np

from rgcn_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint

__all__ = ["save_checkpoint_replicated", "restore_checkpoint_replicated"]


def _to_host(x):
    """Local replica of a (possibly sharded) jax.Array as host numpy.

    For replicated arrays ``addressable_data(0)`` is the full value on every
    process; plain numpy / python leaves pass through ``np.asarray``.
    """
    if isinstance(x, jax.Array):
        try:
            return np.asarray(x.addressable_data(0))
        except (AttributeError, IndexError):
            return np.asarray(x)
    return np.asarray(x)


def save_checkpoint_replicated(
    ckpt_dir: str, state: Any, step: int
) -> Optional[str]:
    """Persist replicated training state; only process 0 touches disk.

    Returns the written path on process 0, ``None`` elsewhere. Safe to call
    from every process of a ``jax.distributed`` run — the host gather is
    local, no collectives are issued, so processes stay in lockstep.
    """
    host_state = jax.tree.map(_to_host, state)
    if jax.process_index() != 0:
        return None
    return save_checkpoint(ckpt_dir, host_state, step)


def restore_checkpoint_replicated(
    ckpt_dir: str,
    like: Any,
    step: Optional[int] = None,
    partial: bool = False,
) -> Tuple[Any, Optional[int]]:
    """Restore on every process (same files -> identical host trees).

    The returned pytree is host-resident; handing it to the sharded jitted
    step replicates it across the mesh exactly as an initial state would
    be. Returns ``(state, step)`` or ``(None, None)``.
    """
    return restore_checkpoint(ckpt_dir, like, step=step, partial=partial)
