"""Test configuration: force an 8-device virtual CPU mesh before JAX loads.

Multi-chip sharding paths are validated on virtual CPU devices
(xla_force_host_platform_device_count); the driver benches on real TPU.
"""
import os

# The image's sitecustomize pins JAX_PLATFORMS=axon (the tunneled TPU);
# JAX_PLATFORM_NAME takes precedence for forcing the host CPU backend.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest

import jax

# Persistent compilation cache: the big jitted pipeline programs compile once
# across test runs instead of every session.
jax.config.update("jax_compilation_cache_dir", "/tmp/movslam_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture
def rng():
    return np.random.default_rng(12345)
