"""Tracing / profiling hooks (SURVEY.md section 5).

The reference exposes PETSc's -log_view implicitly and prints per-step
wall-clock (src/Galewsky.cpp:148-150).  TPU-native equivalents:

  * trace(outdir): context manager around jax.profiler.trace -- produces a
    TensorBoard/Perfetto trace of device execution (set BENCH_PROFILE=1 in
    bench.py, or wrap any run).
  * PhaseTimer: named wall-clock accumulators with device synchronization,
    for the per-phase breakdown (build / step / dump) the step logs print.
  * annotate(name): TraceAnnotation context -- names a region so it shows up
    in the device trace.
"""
from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(outdir: str):
    """Capture a jax.profiler device trace into outdir."""
    jax.profiler.start_trace(outdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Name a region in the device trace (TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


class PhaseTimer:
    """Accumulate wall-clock per named phase; block=True synchronizes the
    device first so the numbers are true phase costs, not dispatch time."""

    def __init__(self):
        self.acc = {}

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            self.acc[name] = self.acc.get(name, 0.0) \
                + time.perf_counter() - t0

    def summary(self) -> str:
        tot = sum(self.acc.values()) or 1.0
        parts = [f"{k} {v:.2f}s ({100 * v / tot:.0f}%)"
                 for k, v in sorted(self.acc.items(), key=lambda kv: -kv[1])]
        return "  ".join(parts)
