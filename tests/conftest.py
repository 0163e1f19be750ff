"""Test configuration: force an 8-device virtual CPU mesh so multi-chip
sharding logic is exercised without TPU hardware (the JAX-native 'fake
backend' — see SURVEY.md §4).

Note: the env-var JAX_PLATFORMS route is ignored by the axon TPU plugin in
this image, so we force via jax.config before any other jax use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
