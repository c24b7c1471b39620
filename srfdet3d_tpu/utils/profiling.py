"""Profiling / tracing hooks (SURVEY §5: the reference has none beyond
mmcv iteration timing; TPU equivalent is jax.profiler + step timers)."""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a TensorBoard-viewable device trace for the enclosed steps."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timing with warmup discard and percentile summary."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times = []
        self._t = None
        self._n = 0

    def __enter__(self):
        self._t = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if exc and exc[0] is not None:
            return   # aborted step: a partial duration would skew p50/p90
        dt = time.perf_counter() - self._t
        self._n += 1
        if self._n > self.warmup:
            self.times.append(dt)

    def summary(self) -> Dict[str, float]:
        import numpy as np
        if not self.times:
            return {}
        t = np.asarray(self.times)
        return {"p50_ms": float(np.percentile(t, 50) * 1e3),
                "p90_ms": float(np.percentile(t, 90) * 1e3),
                "mean_ms": float(t.mean() * 1e3),
                "steps_per_sec": float(1.0 / t.mean())}
