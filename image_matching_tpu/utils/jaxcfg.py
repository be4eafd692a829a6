"""Shared JAX configuration: persistent compilation cache (first compiles
of the big scenario graphs are expensive — especially through the remote
TPU compiler — and fully reusable across runs)."""

import os


def enable_compilation_cache(path: str | None = None):
    import jax

    path = path or os.environ.get("IMTPU_JAX_CACHE", "/root/.cache/imtpu_jax")
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
