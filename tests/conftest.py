"""Test configuration: CPU backend with 8 virtual devices (the standard
fake-multi-device trick for sharding tests — SURVEY.md §4), f64 enabled for
numerical-parity oracles (the reference is Float64 throughout); dedicated f32
tests cast explicitly to exercise the TPU-throughput dtype path."""
import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
