"""Profiling and observability hooks.

The reference has no in-library profiling (SURVEY.md §5); here the
per-phase timers (table build / transform / coder) and jax.profiler traces
are first-class.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Optional

import jax

__all__ = ["PhaseTimer", "trace", "phase"]


class PhaseTimer:
    """Accumulates wall-clock per named phase; thread-unsafe by design."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> dict:
        return {
            name: {"total_s": round(self.totals[name], 6),
                   "count": self.counts[name],
                   "mean_ms": round(
                       1e3 * self.totals[name] / max(self.counts[name], 1),
                       3)}
            for name in sorted(self.totals)
        }

    def report(self) -> str:
        return json.dumps(self.summary(), indent=2)


_GLOBAL = PhaseTimer()


def phase(name: str):
    """Context manager timing a phase on the global timer."""
    return _GLOBAL(name)


def global_summary() -> dict:
    return _GLOBAL.summary()


@contextlib.contextmanager
def trace(log_dir: str, host_tracer_level: Optional[int] = None):
    """jax.profiler trace context (viewable in TensorBoard/XProf)."""
    options = None
    if host_tracer_level is not None:
        options = jax.profiler.ProfileOptions()
        options.host_tracer_level = host_tracer_level
    jax.profiler.start_trace(log_dir, profiler_options=options)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
