"""Process-level JAX configuration helpers."""
from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Persistent XLA compilation cache — first compiles of the large fused
    train step take minutes; subsequent processes reuse the binaries."""
    import jax

    cache_dir = cache_dir or os.environ.get(
        "VFDEPTH_JAX_CACHE", os.path.expanduser("~/.cache/vfdepth_jax"))
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without the flags: fine to skip
        pass
