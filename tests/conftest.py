"""Test configuration: force the CPU platform with 8 virtual devices so
sharding tests run without TPU hardware (multi-chip is validated on a
virtual mesh; real-chip perf is measured separately by bench.py).

NOTE: this environment registers a remote 'axon' TPU backend via
sitecustomize and pins JAX_PLATFORMS=axon; the env var alone does not
override it — jax.config.update after import does.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
