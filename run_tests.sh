#!/bin/bash
# Test runner: forces the JAX CPU backend with 8 virtual devices.
# These env vars MUST be set before the interpreter starts —
# /root/.axon_site/sitecustomize.py registers the axon TPU plugin at
# startup and reads PALLAS_AXON_POOL_IPS then; tests/conftest.py is too
# late to stop it.
export PALLAS_AXON_POOL_IPS=
export JAX_PLATFORMS=cpu
export XLA_FLAGS="--xla_force_host_platform_device_count=8"
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_test_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0
exec python -m pytest "$@"
