"""Profiling and throughput instrumentation.

The reference's only observability is a tqdm bar (SURVEY.md §5); here
profiler traces and examples/sec counters are first-class:

* :func:`trace` wraps a block in a ``jax.profiler`` trace (view in
  TensorBoard / xprof);
* :class:`Throughput` tracks samples/sec with a monotonic clock, used by the
  trainers to report interactions/sec alongside loss.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """``with trace("/tmp/jax-trace"): model.fit(...)`` then inspect in
    TensorBoard's profile plugin."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region inside a trace (shows up on the xprof timeline)."""
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield


class Throughput:
    """Exponentially-smoothed samples/sec counter."""

    def __init__(self, alpha: float = 0.3):
        self.alpha = alpha
        self.rate: Optional[float] = None
        self._last: Optional[float] = None

    def tick(self, num_samples: int) -> Optional[float]:
        now = time.perf_counter()
        if self._last is not None:
            dt = now - self._last
            if dt > 0:
                inst = num_samples / dt
                self.rate = (inst if self.rate is None
                             else self.alpha * inst
                             + (1 - self.alpha) * self.rate)
        self._last = now
        return self.rate

    def format(self) -> str:
        if self.rate is None:
            return ""
        if self.rate >= 1e6:
            return f"{self.rate / 1e6:.2f}M/s"
        if self.rate >= 1e3:
            return f"{self.rate / 1e3:.1f}k/s"
        return f"{self.rate:.0f}/s"
