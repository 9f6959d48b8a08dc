"""Tracing/profiling as a first-class utility.

The reference has no profiling beyond ad-hoc time.time() prints
(SURVEY §5.1). Here: jax.profiler trace capture, a stage timer with
aggregate stats, and a step-rate meter used by the trainers.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a TensorBoard-viewable device trace for the enclosed
    block (jax.profiler)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Named wall-clock sections with aggregate totals."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t = self.totals[name]
            n = self.counts[name]
            lines.append(f"{name}: {t:.3f}s total / {n} calls "
                         f"({1e3 * t / max(n, 1):.2f} ms avg)")
        return "\n".join(lines)


class Throughput:
    """Rolling items/sec meter (rays, samples, steps)."""

    def __init__(self):
        self.t0 = time.perf_counter()
        self.items = 0

    def add(self, n: int):
        self.items += n

    def rate(self) -> float:
        dt = time.perf_counter() - self.t0
        return self.items / dt if dt > 0 else 0.0

    def reset(self):
        self.t0 = time.perf_counter()
        self.items = 0
