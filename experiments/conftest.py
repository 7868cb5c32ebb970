"""Test env: force CPU with 8 virtual devices before any backend init.

This is the "multi-node without a cluster" strategy from SURVEY.md §4 —
sharding tests run against a fake 8-device mesh on CPU; real-TPU behavior
is exercised by bench.py / the driver.

Note: the host image's sitecustomize imports jax at interpreter startup
(to register the TPU backend), so env vars alone are too late for
JAX_PLATFORMS; we override via jax.config before any backend is
instantiated, and XLA_FLAGS before the CPU client is created.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs
