"""Checkpoint / resume for parameters and optimizer state.

New capability relative to the reference (it has no persistence at all —
no ``torch.save``/``state_dict`` anywhere; grep-verified in SURVEY.md §5).
Uses Orbax when available (the TPU-standard checkpointing stack), falling
back to flax's msgpack serialization for a dependency-free path.
"""

from __future__ import annotations

import os
from typing import Any, Optional

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_step"]

_FALLBACK_NAME = "state.msgpack"


def _partial_subtree(raw: Any, like: Any, path: str) -> Any:
    """Select ``like``'s top-level keys out of a restored full tree,
    failing with a diagnosable error (not a bare KeyError) when the stored
    checkpoint lacks a requested entry — e.g. a params-only checkpoint
    probed for ``opt_state``."""
    if not isinstance(like, dict):
        return raw
    missing = [k for k in like if k not in raw]
    if missing:
        raise ValueError(
            f"checkpoint at {path} lacks top-level entries {missing}; "
            f"it holds {sorted(raw)}"
        )
    return {k: raw[k] for k in like}


def _step_dir(ckpt_dir: str, step: int) -> str:
    return os.path.join(ckpt_dir, f"step_{step:08d}")


def save_checkpoint(ckpt_dir: str, state: Any, step: int) -> str:
    """Persist a pytree (params / opt_state / anything flax can serialize)."""
    path = _step_dir(ckpt_dir, step)
    os.makedirs(path, exist_ok=True)
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        target = os.path.join(path, "orbax")
        ckptr.save(target, state, force=True)
        return target
    except Exception:
        from flax import serialization

        target = os.path.join(path, _FALLBACK_NAME)
        with open(target, "wb") as f:
            f.write(serialization.to_bytes(state))
        return target


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [
        int(d.split("_")[1])
        for d in os.listdir(ckpt_dir)
        if d.startswith("step_")
    ]
    return max(steps) if steps else None


def restore_checkpoint(
    ckpt_dir: str,
    like: Any,
    step: Optional[int] = None,
    partial: bool = False,
):
    """Restore into the structure of ``like`` (a template pytree).

    ``partial=True`` restores only the top-level entries present in
    ``like`` — e.g. serving loads ``{"params"}`` from a training
    checkpoint that also holds ``opt_state``.

    Returns ``(state, step)`` or ``(None, None)`` when nothing exists.
    """
    if step is None:
        step = latest_step(ckpt_dir)
    if step is None:
        return None, None
    path = _step_dir(ckpt_dir, step)

    orbax_path = os.path.join(path, "orbax")
    if os.path.exists(orbax_path):
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        if not partial:
            return ckptr.restore(orbax_path, item=like), step
        try:
            return (
                ckptr.restore(orbax_path, item=like, partial_restore=True),
                step,
            )
        except TypeError:  # older orbax without partial_restore
            from flax import serialization

            raw = ckptr.restore(orbax_path)  # template-free full tree
            sub = _partial_subtree(raw, like, orbax_path)
            return serialization.from_state_dict(like, sub), step

    fallback = os.path.join(path, _FALLBACK_NAME)
    if os.path.exists(fallback):
        from flax import serialization

        with open(fallback, "rb") as f:
            payload = f.read()
        if not partial:
            return serialization.from_bytes(like, payload), step
        raw = serialization.msgpack_restore(payload)
        sub = _partial_subtree(raw, like, fallback)
        return serialization.from_state_dict(like, sub), step
    return None, None
