"""Common JAX runtime setup for entry points."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str = "/root/.cache/jax_compilation"):
    """Persist compiled executables across processes — the encode graph alone
    takes minutes to compile, so every entry point should call this first."""
    import jax

    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax or read-only fs: not fatal
