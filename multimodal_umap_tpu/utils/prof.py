"""Tracing/profiling: per-phase wall-time + XLA trace annotations.

The reference has no profiling beyond tqdm bars (SURVEY.md §5.1). Here
each pipeline phase (graph build, spectral, layout, transform, invert)
runs under a named ``jax.profiler.TraceAnnotation`` so device traces are
attributable, and wall times are collected for a phase report.
"""

from __future__ import annotations

import contextlib
import time

import jax


class PhaseTimer:
    """Collects named phase wall-times; emits a report dict."""

    def __init__(self) -> None:
        self.phases: dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        with jax.profiler.TraceAnnotation(name):
            t0 = time.perf_counter()
            try:
                yield
            finally:
                self.phases[name] = (
                    self.phases.get(name, 0.0) + time.perf_counter() - t0
                )

    def report(self) -> dict[str, float]:
        return dict(sorted(self.phases.items(), key=lambda kv: -kv[1]))
