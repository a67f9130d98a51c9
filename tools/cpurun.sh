#!/bin/bash
# Run python on a clean local CPU backend (8 fake devices), scrubbing the
# axon relay hooks that slow local XLA compiles ~15x (see tests/conftest.py).
exec env -u PALLAS_AXON_POOL_IPS -u PALLAS_AXON_REMOTE_COMPILE \
    -u AXON_POOL_SVC_OVERRIDE -u AXON_LOOPBACK_RELAY -u PYTHONPATH \
    JAX_PLATFORMS=cpu \
    XLA_FLAGS="--xla_force_host_platform_device_count=8 ${XLA_FLAGS}" \
    python "$@"
