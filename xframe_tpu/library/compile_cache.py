"""Persistent XLA compilation cache.

This container exposes a single CPU core, so XLA/Mosaic compilation of the
tutorial-scale programs takes minutes per process. The persistent cache
amortizes that across processes: each compiled executable is written to disk
as it finishes, so even an interrupted run leaves the next one warmer.
Call `enable()` before the first jit compilation (importing jax is fine).
"""
from __future__ import annotations

import os

DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable(cache_dir: str | None = None) -> str | None:
    """Turn on the JAX persistent compilation cache (idempotent, best-effort)."""
    import jax

    path = cache_dir or os.environ.get("XF_COMPILE_CACHE", DEFAULT_DIR)
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        return path
    except Exception:  # pragma: no cover - cache is an optimization only
        return None
