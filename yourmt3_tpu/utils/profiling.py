"""Tracing / profiling hooks (SURVEY.md §5.1).

The reference has only W&B step timings; here: jax.profiler traces
(TensorBoard/xprof-compatible, includes Pallas kernel timelines) plus a
lightweight step timer that logs through train.trainer.MetricLogger.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/ymt3_trace") -> Iterator[None]:
    """`with trace("/tmp/t"):` → TensorBoard trace incl. TPU kernels."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


annotate = jax.profiler.TraceAnnotation  # `with annotate("decode"):`


class StepTimer:
    """Wall-time EMA per named phase; cheap enough to leave on."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self.ema = {}

    @contextlib.contextmanager
    def time(self, name: str):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        self.ema[name] = (dt if name not in self.ema
                          else self.alpha * dt + (1 - self.alpha) * self.ema[name])

    def summary(self) -> dict:
        return {f"time/{k}": v for k, v in self.ema.items()}
