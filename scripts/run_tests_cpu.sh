#!/bin/sh
# Run the test suite on a genuine 8-device CPU backend.
#
# In the axon TPU container, the sitecustomize hook registers the TPU backend
# at interpreter startup when PALLAS_AXON_POOL_IPS is set, overriding
# JAX_PLATFORMS; it must be removed from the environment BEFORE python
# launches for the multi-device CPU tests (tests/test_sharding.py) to run.
cd "$(dirname "$0")/.." || exit 1
exec env -u PALLAS_AXON_POOL_IPS \
    JAX_PLATFORMS=cpu \
    XLA_FLAGS="--xla_force_host_platform_device_count=8" \
    python -m pytest tests/ "$@"
