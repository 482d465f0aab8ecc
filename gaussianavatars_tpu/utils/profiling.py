"""Tracing / profiling helpers (SURVEY.md §5).

The reference times iterations with paired CUDA events (`train.py:108-109,
174,245`) and has no profiler integration. TPU-native equivalents:

  * `StepTimer` — EMA wall-time per step with device sync on sample steps
    (sampling avoids forcing a sync every iteration, which would serialise
    the dispatch pipeline);
  * `trace(...)` — context manager around `jax.profiler.trace` writing a
    Perfetto/XPlane trace directory (inspect Pallas kernel timings);
  * `annotate(...)` — named TraceAnnotation for host-side phases.
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


class StepTimer:
    """EMA per-step wall time; syncs the device every `sync_every` steps."""

    def __init__(self, sync_every: int = 50, ema: float = 0.9):
        self.sync_every = sync_every
        self.ema_factor = ema
        self.ema_ms: Optional[float] = None
        self._t0 = time.perf_counter()
        self._steps_since = 0

    def step(self, sync_on=None) -> Optional[float]:
        """Call once per iteration; returns the EMA ms/step on sample steps.

        `sync_on`: an array from this step's outputs to block on when
        sampling (any leaf of the train state).
        """
        self._steps_since += 1
        if self._steps_since < self.sync_every:
            return None
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        dt_ms = (time.perf_counter() - self._t0) * 1000 / self._steps_since
        self.ema_ms = dt_ms if self.ema_ms is None else (
            self.ema_factor * self.ema_ms + (1 - self.ema_factor) * dt_ms
        )
        self._t0 = time.perf_counter()
        self._steps_since = 0
        return self.ema_ms


@contextlib.contextmanager
def trace(log_dir: str):
    """Profile a region to `log_dir` (xplane + Perfetto), if supported."""
    try:
        with jax.profiler.trace(log_dir):
            yield
    except Exception:
        # Some backends (remote tunnels) do not support profiling; degrade
        # to a no-op rather than kill a training run.
        yield


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)
