"""Persistent XLA compile cache helper.

On this class of deployment (remote-compile TPU relays), first-time jit
compiles of large programs take minutes and vary with compiler-queue load;
the persistent cache brings reruns down to seconds and is shared across
processes. Call once before the first jit.
"""

from __future__ import annotations

import os

import jax

__all__ = ["enable_compile_cache"]


def enable_compile_cache(cache_dir: str | None = None, min_compile_secs: float = 1.0) -> str:
    cache_dir = cache_dir or os.environ.get(
        "ART_COMPILE_CACHE", os.path.expanduser("~/.cache/audio_residual_tpu/xla")
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_compile_secs)
    return cache_dir
