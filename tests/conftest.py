"""Test env: force the JAX CPU backend with 8 virtual devices so sharding
tests run without TPU hardware (mirrors the reference's single-node
multi-GPU CI strategy, SURVEY §4).

IMPORTANT: run the suite via ./run_tests.sh — the axon TPU plugin
registers in sitecustomize at interpreter startup, BEFORE this conftest
runs, so the env vars below only help when already set in the shell.
A bare `pytest` silently runs every test on the real TPU chip through
the remote-compile tunnel (10x slower)."""

import os
import warnings

# best-effort (too late if sitecustomize already registered axon)
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")


def pytest_configure(config):
    import jax

    if jax.default_backend() != "cpu":
        warnings.warn(
            "tests are running on the TPU backend — use ./run_tests.sh "
            "to force CPU (much faster, frees the chip)")

# persistent compile cache makes repeated test runs fast
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_ENABLE_XLA_CACHES", "all")
