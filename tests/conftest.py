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

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache. jax 0.9 does NOT read the
# JAX_COMPILATION_CACHE_DIR env var (config stays None; verified in
# round 5) — it must be set through jax.config. Warm-cache suite runs
# drop from ~56 min to minutes.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_test_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
