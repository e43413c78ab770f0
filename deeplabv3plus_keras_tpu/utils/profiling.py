"""Tracing / profiling / structured metrics logging.

The reference has no built-in observability: TF's profiler auto-starts
under fit, the TensorBoard callback is constructed but never enabled
(semantic_segmentation.py:987-990 vs :1007), and the only timing is
``time.time()`` around each mode in ``main()`` (:1812-1825).  Here both
are first-class and on by flag:

- ``profiler_trace(logdir)`` — context manager around ``jax.profiler``
  producing a TensorBoard-loadable XPlane trace of the device steps.
- ``StepTimer`` — per-step wall-clock stats (mean/p50/p95) with warmup
  exclusion.
- ``MetricsLogger`` — append-only JSONL of per-epoch metrics (the
  structured-logging replacement for the disabled TensorBoard callback).
"""

from __future__ import annotations

import contextlib
import json
import os
import time


@contextlib.contextmanager
def profiler_trace(logdir: str | None):
    """jax.profiler trace if logdir is set; no-op otherwise."""
    if not logdir:
        yield
        return
    import jax

    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.times: list[float] = []
        self._t0 = None
        self._count = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self.times.append(dt)
        return False

    def stats(self) -> dict:
        if not self.times:
            return {"steps": 0}
        ts = sorted(self.times)
        n = len(ts)
        return {
            "steps": n,
            "mean_s": sum(ts) / n,
            "p50_s": ts[n // 2],
            "p95_s": ts[min(n - 1, int(n * 0.95))],
        }


class MetricsLogger:
    """Append-only JSONL metrics log (one line per epoch/event)."""

    def __init__(self, path: str | None):
        self.path = path
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)

    def log(self, record: dict):
        if not self.path:
            return
        record = {"ts": time.time(), **record}
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")
