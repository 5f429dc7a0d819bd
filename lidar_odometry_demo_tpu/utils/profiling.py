"""Tracing / profiling instrumentation.

The reference's only telemetry is a per-scan wall-clock printf
("processing time: Xms", lidar_odometry.cpp:23,73-75). TPU equivalent
(SURVEY.md §5): jax.profiler traces viewable in XProf/TensorBoard,
device-synced per-stage timers, and a scans/s counter — the BASELINE
metric.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace of the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in profiler traces."""
    return jax.profiler.TraceAnnotation(name)


class StageTimer:
    """Host-side per-stage wall timers with device sync at the boundaries.

    Usage:
        timer = StageTimer()
        with timer.stage("icp"):
            out = align(...)          # blocks until ready on exit
        print(timer.summary())
    """

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            n = self.counts[name]
            tot = self.totals[name]
            lines.append(f"{name:24s} {1e3 * tot:9.1f} ms total  {1e3 * tot / n:8.2f} ms/call  x{n}")
        return "\n".join(lines)


class ScanRateCounter:
    """Rolling scans/s counter — the BASELINE.json north-star metric."""

    def __init__(self, window: int = 50):
        self.window = window
        self.stamps: list[float] = []

    def tick(self) -> float:
        now = time.perf_counter()
        self.stamps.append(now)
        if len(self.stamps) > self.window:
            self.stamps.pop(0)
        if len(self.stamps) < 2:
            return 0.0
        return (len(self.stamps) - 1) / (self.stamps[-1] - self.stamps[0])
