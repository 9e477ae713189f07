"""Profiling & runtime stats — the analog (and superset) of the reference's
wall-clock logs ("Traversability map has been updated in %f s",
TraversabilityMap.cpp:235,303): structured per-update stats, percentile
latency tracking for online loops, and jax.profiler trace capture."""

from __future__ import annotations

import contextlib
import statistics
import time
from dataclasses import dataclass, field
from typing import Dict, List

import jax


@dataclass
class LatencyTracker:
    """Rolling latency stats for an online loop (config-4 style)."""

    samples: List[float] = field(default_factory=list)
    max_samples: int = 10_000

    def record(self, seconds: float):
        self.samples.append(seconds)
        if len(self.samples) > self.max_samples:
            del self.samples[: len(self.samples) - self.max_samples]

    @contextlib.contextmanager
    def timed(self):
        t0 = time.perf_counter()
        yield
        self.record(time.perf_counter() - t0)

    def summary(self) -> Dict[str, float]:
        if not self.samples:
            return {}
        s = sorted(self.samples)
        n = len(s)
        return {
            "n": n,
            "p50_ms": 1e3 * s[n // 2],
            "p90_ms": 1e3 * s[min(n - 1, int(0.9 * n))],
            "p99_ms": 1e3 * s[min(n - 1, int(0.99 * n))],
            "mean_ms": 1e3 * statistics.fmean(s),
            "max_ms": 1e3 * s[-1],
        }


@contextlib.contextmanager
def device_trace(out_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(out_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed_device(fn, *args, reps: int = 10, **kwargs):
    """Median device time of fn(*args) with async-dispatch amortization."""
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args, **kwargs) for _ in range(reps)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / reps, outs[-1]
