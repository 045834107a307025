"""Test configuration: force an 8-virtual-device CPU platform.

Tests exercise sharding on a virtual CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8) per SURVEY.md §4. The
container's sitecustomize registers the 'axon' TPU platform at interpreter
start; overriding jax_platforms to 'cpu' BEFORE any backend initialisation
keeps the suite off the (single, slow-to-dial) TPU tunnel.
"""

import os

os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=8 " + os.environ.get("XLA_FLAGS", "")
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def key():
    return jax.random.PRNGKey(0)
