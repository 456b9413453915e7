"""Profiling / tracing helpers (SURVEY.md §5.1: the reference had only
commented-out ``time()`` deltas; here tracing is first-class)."""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Emit a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock timer with a hard device fence.

    NOTE: through the axon TPU tunnel ``block_until_ready`` is not a
    reliable fence; fetching a scalar to host (``float(x)``) is. Pass the
    step's scalar output to :meth:`stop`.
    """

    def __init__(self):
        self.times: list[float] = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, fence_scalar=None) -> float:
        if fence_scalar is not None:
            float(fence_scalar)
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        return dt

    @property
    def median(self) -> float:
        return sorted(self.times)[len(self.times) // 2] if self.times else 0.0


def device_memory_stats():
    """Per-device memory stats where the backend exposes them."""
    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out
