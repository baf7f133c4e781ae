"""Profiling hooks: first-class dev flag for jax.profiler traces.

The reference has no tracing/profiling at all (SURVEY.md §5); here any
engine loop can be wrapped in :func:`trace` (Perfetto/XProf-compatible
dumps) or timed with :class:`StepTimer`, controlled by the
``A3VT_PROFILE_DIR`` environment variable so production runs pay nothing.
"""

from __future__ import annotations

import contextlib
import os
import time

import numpy as np

PROFILE_ENV = "A3VT_PROFILE_DIR"


@contextlib.contextmanager
def trace(name: str = "trace", log_dir: str | None = None):
    """Emit a jax.profiler trace if profiling is enabled (by argument or by
    the A3VT_PROFILE_DIR env var); otherwise a no-op."""
    log_dir = log_dir or os.environ.get(PROFILE_ENV)
    if not log_dir:
        yield
        return
    import jax

    path = os.path.join(log_dir, name)
    os.makedirs(path, exist_ok=True)
    with jax.profiler.trace(path):
        yield


class StepTimer:
    """Running step-time statistics (mean / p50 / p95) for engine loops."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.times: list[float] = []
        self._t0: float | None = None
        self._seen = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._seen += 1
        if self._seen > self.warmup:
            self.times.append(dt)

    def stats(self) -> dict:
        if not self.times:
            return {"steps": 0}
        arr = np.asarray(self.times)
        return {
            "steps": len(arr),
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p95_s": float(np.percentile(arr, 95)),
            "steps_per_sec": float(1.0 / arr.mean()),
        }
