"""Test configuration: plugin-free CPU interpreter + 8-device virtual mesh.

The image's sitecustomize loads the tunneled-TPU (axon) PJRT plugin into
every python process at interpreter start. Two consequences for tests:
(1) env vars set here are too late to pick the backend — the jax.config
API still wins because backend *initialization* is lazy; (2) far worse,
with the plugin's shared library in-process some CPU XLA executables
execute INCORRECTLY on this host (measured: the windowed tracking
program returned corrupt flag words under the plugin and correct ones
without — same code, same compile cache). So the FIRST thing this
conftest does is re-exec the test process with the plugin's env trigger
cleared (movslam_tpu/utils/cpuexec.py). Multi-chip sharding paths are
validated on virtual CPU devices; the driver benches on the real TPU.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from movslam_tpu.utils.cpuexec import plugin_active


def pytest_configure(config):
    """Re-exec plugin-free BEFORE any test executes device code. Done here
    (not at conftest import) because pytest's global capture has already
    replaced fd 1/2 with temp files during conftest loading — an execve at
    import time sends the new process's entire output into the orphaned
    capture file. stop_global_capturing() restores the real fds first."""
    if plugin_active() and os.environ.get("MOVSLAM_PLUGIN_FREE") != "1":
        capman = config.pluginmanager.get_plugin("capturemanager")
        if capman is not None:
            capman.stop_global_capturing()
        from movslam_tpu.utils.cpuexec import ensure_plugin_free_cpu

        ensure_plugin_free_cpu()


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
