"""Test env: force CPU backend with 8 virtual devices so multi-chip sharding
paths are exercised without TPU hardware (the multi-device test story the
reference lacks — SURVEY §4)."""

import os

# Detach from the axon TPU relay for CPU test runs: with PALLAS_AXON_POOL_IPS
# set, every interpreter registers the axon PJRT plugin through the tunnel,
# which intermittently stalls for minutes. (Relevant only on the axon dev
# machine; harmless elsewhere.)
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (import after env is set)

# The env vars above are read by jax at *import* time — but installed pytest
# plugins (jaxtyping's, transitively hypothesis/typeguard) import jax BEFORE
# any conftest runs, so under the canonical `pytest tests/` invocation from a
# TPU-attached shell the ambient platform (axon TPU) won the default-backend
# race and the whole suite silently ran on the chip (root cause of the
# round-1 order-dependent test_batch_mesh_divisibility_guard failure).
# config.update is effective until the first backend initialization, which
# plugin import does not trigger — force it here as well.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# The suite is compile-dominated on CPU (the e2e tests compile full train
# steps); the persistent cache makes re-runs ~2-3x faster. Safe across code
# changes (keyed by HLO hash) and across VM migrations (setup_environment
# scopes the cpu cache dir by a host-ISA fingerprint).
from da_detect_tpu.utils.env import setup_environment  # noqa: E402

setup_environment()
