"""Test harness: CPU backend with 8 virtual devices so no TPU is needed
(and multi-chip sharding is testable), per the build-plan test strategy.

Note: the environment may pre-import jax with a TPU platform pinned
(JAX_PLATFORMS=axon via sitecustomize), so we must use jax.config rather
than environment variables to force the CPU backend.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(42)
