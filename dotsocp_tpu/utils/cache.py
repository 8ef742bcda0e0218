"""Persistent XLA compilation cache helper.

The axon TPU tunnel compiles remotely and large while-loop graphs take
minutes; caching compiled executables across processes makes bench and
demo reruns start hot.
"""
from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> str:
    import jax

    path = path or os.environ.get(
        "DOTSOCP_JAX_CACHE", os.path.expanduser("~/.cache/dotsocp_jax")
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path
