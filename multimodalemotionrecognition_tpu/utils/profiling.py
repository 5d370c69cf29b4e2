"""Tracing/observability helpers.

The reference has no tracing at all (SURVEY.md §5); this adds the TPU-native
equivalents: jax.profiler traces (viewable in XProf/TensorBoard) and a
lightweight stage-timer that the serving batcher and trainer use to expose
per-stage latencies.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Dict, Optional

__all__ = ["device_trace", "StageTimer"]


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]):
    """Wrap a region in a jax.profiler trace when `log_dir` is set."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Rolling per-stage latency stats (ms)."""

    def __init__(self, window: int = 128):
        self._samples: Dict[str, deque] = {}
        self.window = window

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = (time.perf_counter() - t0) * 1000.0
            self._samples.setdefault(name, deque(maxlen=self.window)).append(dt)

    def record(self, name: str, ms: float) -> None:
        self._samples.setdefault(name, deque(maxlen=self.window)).append(ms)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, values in self._samples.items():
            if not values:
                continue
            ordered = sorted(values)
            out[name] = {
                "count": len(values),
                "p50_ms": round(ordered[len(ordered) // 2], 2),
                "p95_ms": round(ordered[min(len(ordered) - 1, int(len(ordered) * 0.95))], 2),
                "mean_ms": round(sum(values) / len(values), 2),
            }
        return out
