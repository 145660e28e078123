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


def _raise_scoped_vmem_limit() -> None:
    """Globally raise XLA:TPU's scoped-VMEM limit (default 16 MB).

    This toolchain's XLA aggressively promotes Pallas custom-call OUTPUT
    buffers into scoped VMEM ("stack") inside while-loop bodies; with the
    16 MB default, any promoted output >~8 MB fails compilation with
    "Ran out of memory in memory space vmem ... allocating on stack"
    (hit by the tiled-warp gradient kernels, ops/warp_tiled_pallas.py).
    The limit is not settable via XLA_FLAGS client-side (the CPU-side flag
    parser rejects TPU flags), and per-jit compiler_options would have to
    be threaded through every entry point, so we inject the override into
    jax's compile-option builder once here.  Verified effective against
    the remote compile service (the option rides env_options_overrides).
    """
    from jax._src import compiler as _compiler

    if getattr(_compiler, "_immoco_scoped_vmem_patch", False):
        return
    orig = _compiler.get_compile_options
    # OPT-IN only: raising the limit lets oversized Pallas programs
    # compile, but measured compile times explode (>10 min hangs) on this
    # remote compile service, so it is never on by default.
    kib = os.environ.get("IMMOCO_SCOPED_VMEM_KIB", "0")
    if kib == "0":
        return

    def patched(*args, **kwargs):
        overrides = dict(kwargs.get("env_options_overrides") or {})
        overrides.setdefault("xla_tpu_scoped_vmem_limit_kib", kib)
        kwargs["env_options_overrides"] = overrides
        return orig(*args, **kwargs)

    _compiler.get_compile_options = patched
    _compiler._immoco_scoped_vmem_patch = True


def enable_compile_cache(path: str | None = None) -> str:
    path = path or os.environ.get("IMMOCO_COMPILE_CACHE", DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax or unsupported backend: cache is best-effort
    try:
        _raise_scoped_vmem_limit()
    except Exception:
        pass  # patch is TPU-perf-only; CPU tests don't need it
    return path
