"""Persistent XLA compilation cache setup.

Compiles through the TPU relay can take tens of seconds (occasionally
minutes); the persistent cache makes every entry point fast after the
first run.  Call before the first jit execution; safe to call multiple
times and on any backend.
"""

from __future__ import annotations

import os

import jax

DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_compilation_cache(path: str | None = None) -> str:
    path = path or os.environ.get("DSP_TPU_CACHE_DIR", DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path
