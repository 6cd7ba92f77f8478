"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes. Multi-chip sharding tests use
these host-platform devices in place of a real TPU pod (the reference has
no multi-process tests at all; see SURVEY.md §4).
"""

import os

# Force CPU: the session env pins JAX_PLATFORMS to the (slow, single-chip)
# TPU tunnel; unit tests must run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize hook calls jax.config.update("jax_platforms",
# "axon,cpu") in every process, overriding the env var — override it back
# before any backend initializes.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
assert jax.device_count() == 8, jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)


@pytest.fixture
def np_rng():
    return np.random.default_rng(0)
