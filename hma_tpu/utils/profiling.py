"""Profiling and throughput accounting.

The reference has wall-clock instrumentation only (SURVEY.md §5.1); here
we add jax.profiler trace capture plus the same derived metrics
(6*N*tokens FLOPs accounting, hma/train_multi.py:1037, steps/sec,
IQR-trimmed latency).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/hma_tpu_trace"):
    """Capture a jax.profiler trace around a block (view with XProf/TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def flops_per_update(n_params: int, tokens_per_batch: int) -> int:
    """Analytic 6*N*D training FLOPs (reference: train_multi.py:1037-1038)."""
    return 6 * n_params * tokens_per_batch


class Throughput:
    """Steps/sec + achieved-FLOPs tracker for train loops."""

    def __init__(self, n_params: int, tokens_per_batch: int):
        self.flops = flops_per_update(n_params, tokens_per_batch)
        self._t = time.perf_counter()
        self._steps = 0
        self.history: list[float] = []

    def step(self, n: int = 1) -> Optional[dict]:
        self._steps += n
        now = time.perf_counter()
        dt = now - self._t
        if dt < 1.0:
            return None
        sps = self._steps / dt
        self.history.append(sps)
        self._t, self._steps = now, 0
        return {"steps_per_sec": sps, "model_tflops_per_sec": self.flops * sps / 1e12}


def iqr_mean(samples) -> float:
    """Mean of the inter-quartile range (reference: sim/simulator.py:284-306)."""
    ts = np.asarray(samples, np.float64)
    if len(ts) == 0:
        return float("nan")
    q1, q3 = np.percentile(ts, [25, 75])
    inlier = ts[(ts >= q1) & (ts <= q3)]
    return float(np.mean(inlier)) if len(inlier) else float(np.mean(ts))
