"""Utility surface: logging, profiling, visualization, runtime config."""

import os


def enable_persistent_compile_cache(cache_dir: str | None = None) -> str:
    """Point JAX at an on-disk XLA compile cache.

    The development tunnel serializes remote compiles at ~4-5 s each and
    big graphs (the cycle-VM interpreter inside an outer Krylov loop) take
    minutes; the persistent cache amortizes them across runs and sessions.
    Safe to call multiple times; returns the cache directory.
    """
    import jax

    if cache_dir is None:
        cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))),
            ".jax_cache",
        )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    return cache_dir
