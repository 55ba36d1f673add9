"""Test configuration: force an 8-device virtual CPU mesh.

Must run before jax is imported anywhere; pytest imports conftest first.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell may export axon (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
