"""Re-export of the manual-AD collectives (canonical home:
:mod:`rgcn_tpu.ops.collectives` — placed under ``ops`` so layer code can
import it without a circular ``dist`` → ``train`` → ``models`` import)."""

from rgcn_tpu.ops.collectives import (  # noqa: F401
    all_reduce,
    fanout,
    maybe_all_reduce,
    maybe_fanout,
)

__all__ = ["all_reduce", "fanout", "maybe_all_reduce", "maybe_fanout"]
