"""Tracing/profiling helpers (SURVEY.md §5.1 — absent in the reference).

Wraps jax.profiler for one-line capture of device traces viewable in
TensorBoard/Perfetto, plus a tiny wall-clock timer for step sections.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace into log_dir (open with TensorBoard's
    profile plugin or ui.perfetto.dev)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Running mean/min wall-clock timer for labelled sections."""

    def __init__(self):
        self.totals: dict = {}
        self.counts: dict = {}

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> dict:
        return {
            k: {"mean_s": self.totals[k] / self.counts[k], "n": self.counts[k]}
            for k in self.totals
        }
