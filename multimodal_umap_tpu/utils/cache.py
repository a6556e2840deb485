"""Persistent XLA compilation cache.

This host has a single vCPU, so cold HLO compiles cost 10-80 s each;
the persistent cache makes every rerun of bench/profile/CLI near-free.
Call :func:`enable_compilation_cache` before the first jit execution.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Turns on JAX's persistent compilation cache; returns the dir."""
    import jax

    path = cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR", _DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
