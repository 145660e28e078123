"""Persistent XLA compilation cache.

On the target TPU runtime, compilation round-trips through a remote compile
service; full-size graphs take minutes.  The persistent cache keys serialized
executables by HLO hash, so every script/benchmark process after the first
reuses them.  Call ``enable_compile_cache()`` before the first jit dispatch.
"""

from __future__ import annotations

import os

import jax

DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def enable_compile_cache(path: str | None = None) -> str:
    path = path or os.environ.get("IMMOCO_COMPILE_CACHE", DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax or unsupported backend: cache is best-effort
    return path
