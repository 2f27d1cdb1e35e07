"""Test environment: 8 virtual CPU devices so multi-chip sharding logic is
exercised without TPU hardware (SURVEY §4: mesh tests via
--xla_force_host_platform_device_count)."""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(55555555)  # reference seed (main.py:53)
