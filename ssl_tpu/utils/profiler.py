"""Profiling harness — the reference has only AvgTimer log lines (SURVEY §5);
here: jax.profiler traces + a block_until_ready step timer."""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a TensorBoard-viewable device trace for the enclosed steps."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_step(fn, *args, iters: int = 10, warmup: int = 2, **kwargs):
    """Wall-time a jitted step function with proper device synchronization.
    Returns (seconds_per_iter, last_output)."""
    out = None
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


def device_memory_stats() -> dict:
    """Per-device memory stats when the backend exposes them."""
    stats = {}
    for d in jax.devices():
        try:
            stats[str(d)] = d.memory_stats()
        except Exception:
            stats[str(d)] = None
    return stats
