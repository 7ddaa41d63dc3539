"""Profiling / tracing hooks (absent in the reference; SURVEY.md §5).

``trace_steps`` wraps a window of training steps in a ``jax.profiler`` trace
(viewable in TensorBoard / Perfetto); ``StepTimer`` feeds wall-clock
step/sec into the stats logger.
"""

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace_steps(log_dir: Optional[str]) -> Iterator[None]:
    """Profile everything inside the context into ``log_dir`` (no-op if None)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Tracks steps/sec and seconds/step over a sliding window."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times = []

    def tick(self) -> None:
        self._times.append(time.perf_counter())
        if len(self._times) > self.window:
            self._times.pop(0)

    @property
    def steps_per_sec(self) -> float:
        if len(self._times) < 2:
            return 0.0
        span = self._times[-1] - self._times[0]
        return (len(self._times) - 1) / span if span > 0 else 0.0

    @property
    def sec_per_step(self) -> float:
        sps = self.steps_per_sec
        return 1.0 / sps if sps > 0 else 0.0
