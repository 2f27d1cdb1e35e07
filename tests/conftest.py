"""Test environment: 8 virtual CPU devices so multi-chip sharding logic is
exercised without TPU hardware (SURVEY §4: mesh tests via
--xla_force_host_platform_device_count)."""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"
# The axon TPU-tunnel sitecustomize registers its PJRT plugin at interpreter
# start and overrides platform selection; force CPU back explicitly so tests
# never silently run against the remote chip.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(55555555)  # reference seed (main.py:53)


# Persistent compilation cache: the suite is dominated by XLA:CPU compiles of
# the same programs every run (round-1 wall time 18m48s). Cache hits bring
# repeat runs to interpreter speed. The directory is keyed by a host CPU
# fingerprint: XLA's cache key does NOT include the host machine features,
# and XLA:CPU AOT executables compiled on a different host load with a
# "machine type doesn't match" warning and produce numerically different
# code (observed: a stale cross-host cache made two equivalent programs
# disagree by 1e-4 and failed test_shard_map's bitwise parity).


def _host_key() -> str:
    import hashlib
    import platform
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    return hashlib.sha1(line.encode()).hexdigest()[:12]
    except OSError:
        pass
    return platform.machine() or "unknown"


jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_test_cache",
                               _host_key()))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
