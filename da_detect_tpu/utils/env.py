"""Process-level environment setup (reference utils/env.py:7-37)."""

from __future__ import annotations

import os


def setup_environment(cache_dir: str | None = None) -> None:
    """Enable the persistent XLA compilation cache (the full-size train step
    compiles for minutes; the cache cuts warm starts ~3x even through the
    remote-compile path) and any env-driven knobs."""
    import jax

    cache = (cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR")
             or os.path.expanduser("~/.cache/da_detect_tpu/jax"))
    try:
        # scope per backend: CPU AOT artifacts are machine-specific and a
        # remote-compile TPU setup may share this directory across machines
        cache = os.path.join(cache, jax.default_backend())
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax or read-only fs: run uncached
