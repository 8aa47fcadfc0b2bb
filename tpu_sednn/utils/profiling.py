"""Profiling hooks — replaces the reference's single wall-clock counter
("Total cost time", BPtrain.cc:25-26,91-92) with jax.profiler traces and
first-class throughput accounting.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace (TensorBoard/Perfetto) when log_dir is
    set; no-op otherwise."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Steady-state step timing with warmup exclusion + device sync.

    Under the axon relay jax.block_until_ready can return early, so callers
    should sync via a tiny host readback of the step output before stop().
    """

    def __init__(self, warmup_steps: int = 1):
        self.warmup_steps = warmup_steps
        self._count = 0
        self._t0: Optional[float] = None

    def step(self) -> None:
        self._count += 1
        if self._count == self.warmup_steps:
            self._t0 = time.perf_counter()

    @property
    def measured_steps(self) -> int:
        return max(0, self._count - self.warmup_steps)

    def rate(self) -> float:
        if self._t0 is None or self.measured_steps == 0:
            return 0.0
        return self.measured_steps / (time.perf_counter() - self._t0)
