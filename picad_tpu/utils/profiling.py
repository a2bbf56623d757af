"""Profiling hooks + throughput meters.

The reference's only observability is wall-clock prints per epoch
(main_ucf101.py:217-219).  Here: a jax.profiler trace context manager
(view in TensorBoard / xprof) and a StepTimer that reports
clips/sec/chip — the BASELINE.json north-star metric.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace_context(log_dir: str | None):
    """Capture a device trace for the enclosed steps (no-op if dir None)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock throughput meter: clips/sec and clips/sec/chip."""

    def __init__(self, clips_per_step: int, n_chips: int | None = None):
        self.clips_per_step = clips_per_step
        self.n_chips = n_chips or jax.device_count()
        self.reset()

    def reset(self) -> None:
        self._t0 = time.perf_counter()
        self._steps = 0

    def tick(self, n: int = 1) -> None:
        self._steps += n

    def report(self) -> dict:
        dt = time.perf_counter() - self._t0
        clips = self._steps * self.clips_per_step
        cps = clips / dt if dt > 0 else 0.0
        return {
            "steps": self._steps,
            "seconds": dt,
            "clips_per_sec": cps,
            "clips_per_sec_per_chip": cps / self.n_chips,
        }
