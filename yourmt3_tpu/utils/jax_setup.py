"""Common JAX runtime setup: persistent compilation cache.

The axon remote-compile helper on this class of host takes minutes per
large program; the persistent cache makes re-runs (and bench/driver
invocations) start instantly. Call early, before the first jit.
"""

from __future__ import annotations

import os


def setup_jax(cache_dir: str = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "YMT3_JAX_CACHE", os.path.join(os.path.dirname(__file__),
                                       "..", "..", ".jax_cache"))
    cache_dir = os.path.abspath(cache_dir)
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass  # older jax without the knobs: run uncached
