"""Persistent XLA compile cache.

The tunneled TPU backend's remote compiles have multi-minute latency variance;
caching compiled executables in-repo makes reruns (bench, training restarts)
near-instant.  Safe to call multiple times."""

from __future__ import annotations

import os


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    import jax
    if cache_dir is None:
        root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        cache_dir = os.path.join(root, ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return cache_dir
