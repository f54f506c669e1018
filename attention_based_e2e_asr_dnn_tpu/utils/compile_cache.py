"""Persistent XLA compilation cache setup.

On this TPU stack the first execution of a new program pays a multi-minute
remote compile (measured 200-500s for the LAS decode graph); the persistent
cache amortizes it across processes and sessions. Called by every entry
point before the first jit execution.
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None,
                             min_compile_secs: float = 1.0) -> str:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "TPU_LAS_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "tpu_las_jax"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    return cache_dir
