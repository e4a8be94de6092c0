"""Prove the cpu_aot_loader feature-mismatch log spam benign.

Every load of a persistent-cache entry on this host emits ERROR lines from
``cpu_aot_loader.cc`` claiming the compile machine features don't match the
host ("could lead to SIGILL"). Root cause: LLVM's host detection embeds the
Downfall-mitigation *tuning* hints ``prefer-no-gather``/``prefer-no-scatter``
into the compile-time feature string (llvm Host.cpp), while the loader's
host-feature enumeration lists only real CPUID ISA features — so entries
compiled on THIS host still "mismatch". Tuning hints change instruction
*selection* preference, not legality: no SIGILL is possible from them.

This test pins that mechanically: a fresh cache is populated and re-loaded in
subprocesses; the reloaded result must be bit-identical, and every feature the
loader complains about must be one of the two tuning hints. If XLA ever
complains about a REAL ISA feature (an actual SIGILL risk — e.g. the
cache-partitioning fingerprint in utils/env.py regressed), this fails.

scripts/test.sh drops exactly these lines from stderr; this test is the
evidence that the filter hides noise, not signal.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

BENIGN_TUNING_FLAGS = {"prefer-no-gather", "prefer-no-scatter"}

_CHILD = """
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", {cache!r})
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
f = jax.jit(lambda x: jnp.sin(x) @ x + jnp.tanh(x).sum())
out = f(jnp.arange(64.0).reshape(8, 8))
print("RESULT", repr(jnp.asarray(out).tobytes().hex()))
"""


def _run(cache_dir):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    p = subprocess.run([sys.executable, "-c", _CHILD.format(cache=cache_dir)],
                       capture_output=True, text=True, env=env, timeout=300)
    assert p.returncode == 0, p.stderr[-2000:]
    result = [l for l in p.stdout.splitlines() if l.startswith("RESULT ")]
    assert result, p.stdout
    return result[0], p.stderr


def test_aot_loader_mismatch_limited_to_tuning_hints(tmp_path):
    cache = str(tmp_path / "jaxcache")
    cold_result, _ = _run(cache)
    assert os.listdir(cache), "persistent cache wrote nothing"
    warm_result, warm_err = _run(cache)

    # the cached executable computes the identical answer
    assert warm_result == cold_result

    complaints = re.findall(
        r"Target machine feature \+?([\w.\-]+) is not", warm_err)
    unexpected = set(complaints) - BENIGN_TUNING_FLAGS
    assert not unexpected, (
        f"cpu_aot_loader complained about real ISA features {unexpected}; "
        "the persistent-cache host fingerprint (utils/env.py) may have "
        "regressed — this IS a SIGILL risk, do not filter it")
