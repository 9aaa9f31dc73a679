"""Persistent XLA compile-cache enablement that works under preloaded jax.

Setting JAX_COMPILATION_CACHE_DIR via `os.environ` inside a script does
NOT work on images whose sitecustomize imports jax at interpreter startup
(e.g. the axon TPU tunnel): jax's config reads the env at import time, so
the in-process `setdefault` lands after the fact and the persistent cache
silently stays disabled — every process then pays the full 50-230 s
compile for the big n=10k programs.  `enable_compile_cache()` sets the
config at runtime instead, which works regardless of import order.

(Exported subprocess env vars — e.g. the experiment launcher's shared
JAX_COMPILATION_CACHE_DIR for replicates — are fine: they exist before the
child interpreter starts.)
"""

from __future__ import annotations

import os

import jax

DEFAULT_CACHE_DIR = "/tmp/jax_cache"


def enable_compile_cache(path: str | None = None,
                         min_compile_secs: float = 1.0) -> str:
    """Point jax's persistent compilation cache at `path` (default: the
    JAX_COMPILATION_CACHE_DIR env var, else /tmp/jax_cache).  Idempotent;
    returns the directory in effect."""
    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                  DEFAULT_CACHE_DIR)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(os.environ.get(
                          "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS",
                          min_compile_secs)))
    return path
