"""Profiling: jax.profiler traces + stage timing helpers.

SURVEY.md §5 "tracing/profiling": the reference uses OTel spans + a
per-stage latency report; the TPU equivalent adds `jax.profiler` device
traces (viewable in TensorBoard/Perfetto) around any code region, plus
a lightweight stage timer that feeds the same rolling-window report the
pipeline already exposes.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, List, Optional


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace (XLA ops, DMA, fusion timeline)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region inside a device trace (TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


class StageTimer:
    """Rolling-window stage timer (reference pipeline.py:406-412 shape)."""

    def __init__(self, window: int = 1000):
        self.window = window
        self._samples: Dict[str, List[float]] = {}

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            ms = (time.perf_counter() - t0) * 1e3
            window = self._samples.setdefault(name, [])
            window.append(ms)
            if len(window) > self.window:
                del window[: len(window) - self.window]

    def report(self) -> Dict[str, Dict[str, float]]:
        import numpy as np

        out = {}
        for name, vals in self._samples.items():
            arr = np.asarray(vals)
            out[name] = {
                "p50": float(np.percentile(arr, 50)),
                "p95": float(np.percentile(arr, 95)),
                "p99": float(np.percentile(arr, 99)),
                "count": len(vals),
            }
        return out


__all__ = ["device_trace", "annotate", "StageTimer"]
