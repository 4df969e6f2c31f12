"""Profiling / tracing hooks (SURVEY.md §5.1 rebuild).

The reference has only wall-clock prints (reference train.py:354-364,
utils/trainer.py:375,384-390). Here: the same user-visible wall-time
surface plus real TPU tracing — `jax.profiler` traces viewable in
TensorBoard/XProf, and a lightweight per-step timer with percentile
summaries for step-time regressions.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import numpy as np


@contextlib.contextmanager
def profile_trace(logdir: Optional[str]):
    """Trace the enclosed block with jax.profiler when `logdir` is set
    (config key 'profile_dir'); no-op otherwise."""
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Per-step wall-time collector with percentile summary."""

    def __init__(self):
        self._times: List[float] = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self):
        if self._t0 is not None:
            self._times.append(time.perf_counter() - self._t0)
            self._t0 = None

    @contextlib.contextmanager
    def step(self):
        self.start()
        try:
            yield
        finally:
            self.stop()

    def summary(self) -> Dict[str, float]:
        if not self._times:
            return {}
        arr = np.asarray(self._times)
        return {
            "steps": int(arr.size),
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p90_s": float(np.percentile(arr, 90)),
            "p99_s": float(np.percentile(arr, 99)),
            "total_s": float(arr.sum()),
        }

    def reset(self):
        self._times.clear()
        self._t0 = None
