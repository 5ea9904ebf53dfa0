"""Tracing / profiling utilities.

Reference equivalents (SURVEY.md §5 tracing/profiling):
- `torch.autograd.profiler.record_function` spans → jax.profiler.TraceAnnotation
- `--profile` CUDA profiler hook in the Trainer → jax.profiler.start_trace /
  stop_trace writing a TensorBoard-loadable trace
- SimulEval wall-clock per policy call → eval/instance.py `elapsed` bookkeeping
  (already feeds every `_CA` metric twin)
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Optional


@contextmanager
def trace_span(name: str):
    """Annotate a host-side span so it shows up in the XLA/TPU trace viewer."""
    import jax.profiler

    with jax.profiler.TraceAnnotation(name):
        yield


@contextmanager
def device_trace(log_dir: str):
    """Capture a device trace (view with TensorBoard's profile plugin)."""
    import jax.profiler

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling updates-per-second / step-time tracker for the train loop."""

    def __init__(self, window: int = 100):
        import collections
        import time

        self._time = time
        self.times = collections.deque(maxlen=window)
        self.last: Optional[float] = None

    def tick(self):
        now = self._time.perf_counter()
        if self.last is not None:
            self.times.append(now - self.last)
        self.last = now

    @property
    def avg_step_seconds(self) -> float:
        return sum(self.times) / len(self.times) if self.times else 0.0
