"""Tracing / profiling (SURVEY.md §5.1 — the reference has only wall-clock
timers, train.py:98-101).

* ``profile_trace``: context manager around ``jax.profiler`` writing a
  TensorBoard-readable trace directory; enabled by the drivers' --profile.
* ``StepTimer``: wall-clock step/epoch timing with correct device
  synchronization for the tunneled TPU platform (block_until_ready can
  return early there; a host value fetch is the reliable barrier).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax
import numpy as np


def device_sync(x) -> float:
    """Reliable device barrier: fetch one scalar to the host."""
    leaf = jax.tree.leaves(x)[0]
    return float(np.asarray(leaf).reshape(-1)[0])


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """jax.profiler trace when log_dir is set; no-op otherwise."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Running per-step/epoch timing with ETA (reference train.py:98-111)."""

    def __init__(self, total_steps: int):
        self.total = total_steps
        self.start = time.perf_counter()
        self.done = 0
        self.last = self.start

    def tick(self, sync_on=None) -> dict:
        if sync_on is not None:
            device_sync(sync_on)
        now = time.perf_counter()
        self.done += 1
        dt = now - self.last
        self.last = now
        avg = (now - self.start) / self.done
        return {
            "step_time_s": dt,
            "avg_step_time_s": avg,
            "eta_s": avg * max(self.total - self.done, 0),
        }
