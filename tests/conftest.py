"""Test configuration: force an 8-device virtual CPU mesh before JAX backends
initialize.

The image's sitecustomize imports jax and registers the tunneled-TPU (axon)
plugin at interpreter start, so env vars set here are too late — but backend
*initialization* is lazy, so the jax.config API still wins. Multi-chip
sharding paths are validated on virtual CPU devices; the driver benches on
the real TPU.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the big jitted pipeline programs compile once
# across test runs instead of every session.
jax.config.update("jax_compilation_cache_dir", "/tmp/movslam_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(12345)
