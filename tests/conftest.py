"""Test harness config: run all tests on a simulated 8-device CPU mesh.

Per SURVEY.md §4: multi-host/sharding logic must be exercisable without a pod via
XLA's host-platform device-count override. The container's sitecustomize imports jax and
registers a TPU backend at interpreter startup, so env vars alone don't stick — we also
flip the default platform via jax.config. The CPU client initializes lazily, so setting
XLA_FLAGS here (before first CPU-backend use) still yields 8 virtual devices.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platform_name", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def cpu_mesh_devices():
    devs = jax.devices("cpu")
    assert len(devs) >= 8, "expected 8 virtual CPU devices (XLA_FLAGS)"
    return devs
