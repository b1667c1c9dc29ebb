"""Test env: force the CPU backend with 8 virtual devices so multi-chip
sharding paths compile and execute without TPU hardware (the JAX-native
"fake backend", SURVEY.md §4d). Must run before jax imports."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import pytest  # noqa: E402

# the axon sitecustomize force-sets jax_platforms="axon,cpu" at interpreter
# start, overriding the env var — force CPU back before any backend init
jax.config.update("jax_platforms", "cpu")


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
