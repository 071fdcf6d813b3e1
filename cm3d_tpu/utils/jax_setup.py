"""JAX runtime setup shared by the CLI drivers."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    """Persistent XLA compilation cache: repeat CLI runs skip the multi-
    minute full-scale compiles (especially costly on tunneled backends)."""
    import jax

    cache_dir = path or os.environ.get(
        "CM3D_COMPILATION_CACHE", os.path.expanduser("~/.cache/cm3d_tpu_xla")
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knobs
