"""Test configuration: force an 8-device virtual CPU mesh.

Must run before jax is imported anywhere — pytest imports conftest first.
The CPU mesh is the 'fake backend' for multi-chip sharding tests (the same
shard_map code path runs on a real TPU slice).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# 8 virtual devices x multi-threaded Eigen ops on a 4-core host spend most
# of the suite in scheduler spin (measured: the worst test drops 469s ->
# 182s single-threaded; `time` showed 13 min SYS vs 1.5 min USER).
if "xla_cpu_multi_thread_eigen" not in flags:
    flags = (flags + " --xla_cpu_multi_thread_eigen=false").strip()
os.environ["XLA_FLAGS"] = flags

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config update is
# what actually pins tests to the virtual 8-device CPU mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_ROOT = "/root/reference"


def reference_asset(rel: str) -> str:
    return os.path.join(REFERENCE_ROOT, rel)


def has_reference_assets() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


needs_assets = pytest.mark.skipif(
    not has_reference_assets(), reason="reference assets not mounted")


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
