"""Tracing / profiling hooks (SURVEY §5: the reference has none — Keras
progress bars were its only instrumentation).

- ``annotate``: named trace spans that show up in a captured ``jax.profiler``
  trace (perfetto/tensorboard),
- ``trace``: context manager around ``jax.profiler.start_trace``,
- ``ThroughputMeter``: host-side edges/s / steps/s counters, the BASELINE.md
  metric."""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named span visible in profiler traces (cheap no-op otherwise)."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace into ``log_dir`` (view with tensorboard or
    perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ThroughputMeter:
    """Accumulates per-step edges/iterations and reports edges/s."""

    def __init__(self) -> None:
        self.reset()

    def reset(self) -> None:
        self._edges = 0.0
        self._steps = 0
        self._t0: Optional[float] = None
        self._elapsed = 0.0

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> None:
        if self._t0 is not None:
            self._elapsed += time.perf_counter() - self._t0
            self._t0 = None

    def step(self, n_edges: int, n_iterations: float = 1.0) -> None:
        self._edges += float(n_edges) * float(n_iterations)
        self._steps += 1

    @property
    def edges_per_s(self) -> float:
        return self._edges / self._elapsed if self._elapsed else 0.0

    @property
    def steps_per_s(self) -> float:
        return self._steps / self._elapsed if self._elapsed else 0.0

    def report(self) -> dict:
        return {
            "edges_per_s": self.edges_per_s,
            "steps_per_s": self.steps_per_s,
            "steps": self._steps,
            "elapsed_s": self._elapsed,
        }
