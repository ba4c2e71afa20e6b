"""Profiling helpers: step timing + jax.profiler traces.

The reference's only profiling is tqdm postfix + manual memory math
(SURVEY.md section 5). Here: a StepTimer that reports the north-star metric
(traces/sec/chip) and a context manager that captures a TensorBoard-viewable
device trace via ``jax.profiler``.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax


class StepTimer:
    """Throughput counter with compile-step exclusion.

    >>> timer = StepTimer(batch_size=32, skip=3)
    >>> for batch in loader:
    ...     with timer.step():
    ...         out = train_step(...)
    >>> timer.summary()  # {'steps': ..., 'traces_per_sec': ...}
    """

    def __init__(self, batch_size: int, skip: int = 3):
        self.batch_size = batch_size
        self.skip = skip
        self.count = 0
        self.total = 0.0

    @contextlib.contextmanager
    def step(self) -> Iterator[None]:
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        self.count += 1
        if self.count > self.skip:
            self.total += dt

    def summary(self) -> Dict[str, float]:
        timed = max(self.count - self.skip, 0)
        if timed == 0 or self.total == 0:
            return {"steps": self.count, "traces_per_sec": 0.0,
                    "ms_per_step": 0.0}
        return {
            "steps": self.count,
            "traces_per_sec": timed * self.batch_size / self.total,
            "ms_per_step": self.total / timed * 1000.0,
        }


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace (view with TensorBoard / Perfetto).
    No-op when log_dir is None."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
