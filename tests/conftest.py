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

# Persistent XLA compilation cache: the suite is compile-dominated (tiny
# shapes, one host core), and scene tables pad to power-of-two buckets, so
# MANY tests lower to byte-identical HLO modules — the cache turns every
# repeat into a deserialization, both across files within one cold run and
# across reruns while iterating. Keyed by jax version via the cache's own
# fingerprint; safe to share in /tmp.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_TEST_CACHE_DIR",
                                 "/tmp/jax_cache_yacge_tests"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(42)
