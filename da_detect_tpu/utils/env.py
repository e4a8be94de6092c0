"""Process-level environment setup (reference utils/env.py:7-37)."""

from __future__ import annotations

import hashlib
import os


def _host_cpu_fingerprint() -> str:
    """Short stable hash of the host CPU's model + feature flags."""
    sig = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("model name", "flags")):
                    sig = sig + line
                    if "flags" in line:
                        break
    except OSError:
        import platform

        sig = platform.processor() or platform.machine()
    return hashlib.sha256(sig.encode()).hexdigest()[:12]


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
        backend = jax.default_backend()
        cache = os.path.join(cache, backend)
        if backend == "cpu":
            # ... and per host-CPU profile: jax's cache key does NOT include
            # the host ISA, so after a VM migration the cache serves AOT
            # executables compiled for the old machine's features
            # (cpu_aot_loader then warns "machine type ... doesn't match"
            # and the code runs scalarized or, worse, SIGILLs)
            cache = os.path.join(cache, _host_cpu_fingerprint())
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax or read-only fs: run uncached
