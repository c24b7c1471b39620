"""Training observability: text + optional TensorBoard metric logging.

Replaces mmcv TextLoggerHook / TensorboardLoggerHook (cfg
srfdet_voxel_nusc_L.py:384-389): per-interval loss lines with iter timing,
and tf.summary scalars when a log_dir is given.
"""

from __future__ import annotations

import time
from typing import Dict, Optional


class MetricLogger:
    def __init__(self, interval: int = 50, log_dir: Optional[str] = None):
        self.interval = interval
        self._last = time.perf_counter()
        self._writer = None
        if log_dir:
            try:
                import tensorflow as tf
                self._writer = tf.summary.create_file_writer(log_dir)
            except Exception:
                self._writer = None

    def log(self, step: int, metrics: Dict[str, float],
            lr: Optional[float] = None) -> None:
        if step % max(self.interval, 1):
            return
        now = time.perf_counter()
        dt = (now - self._last) / max(self.interval, 1)
        self._last = now
        parts = [f"iter {step}", f"{dt * 1000:.0f} ms/iter"]
        if lr is not None:
            parts.append(f"lr {lr:.2e}")
        parts += [f"{k} {float(v):.4f}" for k, v in sorted(metrics.items())]
        print("  ".join(parts), flush=True)
        if self._writer is not None:
            import tensorflow as tf
            with self._writer.as_default():
                for k, v in metrics.items():
                    tf.summary.scalar(k, float(v), step=step)
                if lr is not None:
                    tf.summary.scalar("lr", lr, step=step)

    def log_eval(self, step: int, metrics: Dict[str, float]) -> None:
        """Validation metrics (mmcv EvalHook lines) — always printed,
        scalars land under val/ in TensorBoard."""
        scalars = {k: float(v) for k, v in metrics.items()
                   if isinstance(v, (int, float))}
        parts = [f"eval @ iter {step}"]
        parts += [f"{k} {v:.4f}" for k, v in sorted(scalars.items())]
        print("  ".join(parts), flush=True)
        if self._writer is not None:
            import tensorflow as tf
            with self._writer.as_default():
                for k, v in scalars.items():
                    tf.summary.scalar(f"val/{k}", v, step=step)
