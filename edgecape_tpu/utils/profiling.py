"""Profiling & timing utilities.

The reference has no tracing/profiling subsystem (SURVEY.md 5 — only a
progress bar); this module adds the TPU-native equivalents: a jax.profiler
trace context (viewable in TensorBoard / Perfetto), a trace-server starter
for live capture, and a device-synchronized timer that works around the
axon tunnel's non-blocking block_until_ready.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax
import numpy as np


def start_server(port: int = 9999):
    """Start the profiler server for on-demand capture (TensorBoard's
    'capture profile' or xprof)."""
    return jax.profiler.start_server(port)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a trace of the enclosed block into log_dir."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def synced_time(fn, *args, iters: int = 5, warmup: int = 1,
                materialize: bool = True) -> float:
    """Best-of-iters wall time (seconds) of fn(*args), forcing device
    completion by materializing the output on host (block_until_ready does
    not reliably block through the axon tunnel)."""
    def run():
        out = fn(*args)
        if materialize:
            jax.tree.map(np.asarray, out)
        else:
            jax.block_until_ready(out)

    for _ in range(warmup):
        run()
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return best


class StepTimer:
    """Iteration timer with exponential moving average — the IterTimerHook
    equivalent for the training loop."""

    def __init__(self, momentum: float = 0.9):
        self.momentum = momentum
        self.avg: Optional[float] = None
        self._t0: Optional[float] = None

    def tic(self):
        self._t0 = time.perf_counter()

    def toc(self) -> float:
        dt = time.perf_counter() - self._t0
        self.avg = dt if self.avg is None else (
            self.momentum * self.avg + (1 - self.momentum) * dt)
        return dt
