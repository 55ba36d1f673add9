"""Test configuration: force an 8-device virtual CPU mesh.

Must run before jax is imported anywhere; pytest imports conftest first.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell may export axon (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the axon sitecustomize force-registers the TPU backend regardless of
# JAX_PLATFORMS; override via jax.config so tests run on the virtual CPU mesh
jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: repeat test runs skip recompilation.
# Keyed by the host's CPU features: XLA:CPU AOT artifacts embed the compile
# host's ISA, and a cache dir inherited from another box risks SIGILL.
from __graft_entry__ import _host_cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir", _host_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
