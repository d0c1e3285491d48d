"""Test configuration: run everything on CPU with 8 virtual devices so
mesh/pjit paths are exercised without TPU hardware (SURVEY.md §4e).

NOTE: this environment's sitecustomize registers an `axon` TPU PJRT plugin
at interpreter startup and force-updates jax_platforms — setting the
JAX_PLATFORMS env var here is NOT enough; we must update jax.config after
the fact (backends initialize lazily, so this is safe in conftest)."""

import os

# Must be set before the first jax computation initializes the CPU client.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_sessionstart(session):
    assert jax.devices()[0].platform == "cpu", "tests must run on CPU"
    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
