"""Tracing / profiling hooks.

The reference only has ad-hoc wall-clock deltas (train.py:175,219;
cross_validation.py:161-166). Here profiling is a subsystem (SURVEY.md §5):

- ``trace(dir)``: jax.profiler trace context — produces a TensorBoard-
  loadable trace of device execution.
- ``StepTimer``: lightweight per-step wall-clock aggregation with
  percentile summaries, used by the training loop's verbose mode.
- ``annotate(name)``: TraceAnnotation context for labeling host-side
  phases inside a trace.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/segtpu_trace"):
    """Capture a jax.profiler device trace (view with TensorBoard)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named annotation inside a trace (host-side phase labeling)."""
    import jax
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Accumulates named phase durations; reports mean/p50/p99."""

    def __init__(self):
        self._samples: Dict[str, List[float]] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._samples.setdefault(name, []).append(
                time.perf_counter() - t0)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, xs in self._samples.items():
            a = np.asarray(xs)
            out[name] = {
                "count": int(a.size),
                "total_s": float(a.sum()),
                "mean_ms": float(a.mean() * 1e3),
                "p50_ms": float(np.percentile(a, 50) * 1e3),
                "p99_ms": float(np.percentile(a, 99) * 1e3),
            }
        return out

    def report(self) -> str:
        lines = []
        for name, s in sorted(self.summary().items(),
                              key=lambda kv: -kv[1]["total_s"]):
            lines.append(f"{name:24} n={s['count']:5d} "
                         f"total={s['total_s']:8.2f}s "
                         f"mean={s['mean_ms']:7.2f}ms p99={s['p99_ms']:7.2f}ms")
        return "\n".join(lines)
