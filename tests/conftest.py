"""Test configuration: run on a virtual 8-device CPU mesh with x64 available.

Multi-chip sharding tests use XLA's host-platform device virtualization
(the driver separately dry-runs the real multi-chip path; see
__graft_entry__.py).  Env vars must be set before jax initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the environment pre-sets jax_platforms="axon,cpu" (TPU tunnel); tests run on
# the virtual CPU mesh, so force cpu before any backend initializes
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
