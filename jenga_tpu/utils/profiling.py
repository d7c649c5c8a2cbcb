"""Profiling & timing instrumentation (the reference has only ad-hoc
``time.time()`` prints, SURVEY.md §5; here: first-class jax.profiler traces
and per-stage wall-clock metrics)."""

from __future__ import annotations

import contextlib
import json
import time

import jax

__all__ = ["StageTimer", "trace", "annotate"]


class StageTimer:
    """Collects named wall-clock spans (device-synchronized)."""

    def __init__(self):
        self.spans: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def span(self, name: str, sync=None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        dt = time.perf_counter() - t0
        self.spans[name] = self.spans.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> dict:
        return {k: {"total_s": round(v, 4), "count": self.counts[k],
                    "mean_s": round(v / self.counts[k], 4)}
                for k, v in self.spans.items()}

    def dump(self, path: str):
        with open(path, "w") as f:
            json.dump(self.report(), f, indent=2)


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace window; view with tensorboard/xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)
