#!/bin/bash
# Run the test suite on the virtual CPU mesh, detached from the axon TPU
# relay (the relay handshake in sitecustomize can stall interpreter startup
# for minutes; conftest.py runs too late to prevent it).
exec env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
  python -m pytest "${@:-tests/}" -q -p no:cacheprovider
