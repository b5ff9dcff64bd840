"""Test configuration: run everything on a virtual 8-device CPU mesh so
sharding/pjit paths are exercised without TPU hardware (SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: ambient env may point at TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402

# Persistent compile cache: trainer tests re-jit identical programs across
# test functions/processes; this cuts suite time dramatically on CPU.
import jax  # noqa: E402

# The ambient axon TPU plugin ignores the JAX_PLATFORMS env var; this config
# update is what actually pins tests to CPU (a single real TPU chip would
# serialize concurrent test runs and hide sharding bugs).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture(scope="session")
def synthetic_task(tmp_path_factory):
    """A small Decathlon-style synthetic task usable across tests."""
    from tests.synthetic import make_synthetic_task
    root = tmp_path_factory.mktemp("raw")
    return make_synthetic_task(str(root), task_name="Task097_SynthA", num_cases=6, seed=0)


@pytest.fixture(scope="session")
def synthetic_task_b(tmp_path_factory):
    from tests.synthetic import make_synthetic_task
    root = tmp_path_factory.mktemp("rawb")
    return make_synthetic_task(str(root), task_name="Task098_SynthB", num_cases=6, seed=7,
                               intensity_shift=0.8)
