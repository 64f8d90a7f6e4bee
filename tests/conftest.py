"""Test env: force the JAX CPU backend with 8 virtual devices so sharding
tests run without TPU hardware (mirrors the reference's single-node
multi-GPU CI strategy, SURVEY §4)."""

import os

# must run before any jax import
os.environ["PALLAS_AXON_POOL_IPS"] = ""   # skip axon TPU plugin registration
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

# persistent compile cache makes repeated test runs fast
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_ENABLE_XLA_CACHES", "all")
