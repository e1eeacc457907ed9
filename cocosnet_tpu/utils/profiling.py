"""Profiling / tracing hooks (SURVEY §5: the reference only has wall-clock
time-per-iter, iter_counter.py:42-50 — here we add real device traces).

Usage:
    with maybe_trace(opt.profile_dir, step=i):
        state, metrics, _ = train_step(...)

or start/stop around a window:
    start_trace("/tmp/trace"); ... ; stop_trace()

Traces are viewable with tensorboard/xprof (`pip install tensorboard-plugin-
profile` on a dev machine; the files are standard jax.profiler output).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


def start_trace(logdir: str) -> None:
    jax.profiler.start_trace(logdir)


def stop_trace() -> None:
    jax.profiler.stop_trace()


@contextlib.contextmanager
def maybe_trace(logdir: Optional[str], enabled: bool = True) -> Iterator[None]:
    if logdir and enabled:
        jax.profiler.start_trace(logdir)
        try:
            yield
        finally:
            jax.profiler.stop_trace()
    else:
        yield


class Throughput:
    """Images/sec EMA for step logging."""

    def __init__(self, beta: float = 0.9):
        self.beta = beta
        self.value = None
        self._last = None

    def step(self, n_images: int) -> float:
        now = time.perf_counter()
        if self._last is not None:
            ips = n_images / (now - self._last)
            self.value = (ips if self.value is None
                          else self.beta * self.value + (1 - self.beta) * ips)
        self._last = now
        return self.value or 0.0
