"""Test configuration: CPU backend with 8 virtual devices, float64.

Mirrors the reference's strategy of running distributed tests without a
cluster (tests/ecsim/CMakeLists.txt:16-18 re-runs the same binaries
under ``mpiexec -np 2``): here the same jitted code runs on a simulated
8-device mesh via ``--xla_force_host_platform_device_count``.
"""

import os
import sys

# The axon sitecustomize (PYTHONPATH=.axon_site) initializes the JAX
# backend at interpreter startup, which locks the CPU device count to 1
# before any XLA_FLAGS/jax config can take effect.  Re-exec the test
# run without it so the 8-virtual-device mesh is available.
# NOTE: under the axon sitecustomize (PYTHONPATH=.axon_site) the JAX
# backend is initialized at interpreter startup, locking the CPU device
# count to 1 — multi-device tests then skip.  Run
# ``tests/run_multidevice.sh`` (or ``env -u PYTHONPATH pytest ...``) to
# get the full 8-virtual-device mesh.

# Force CPU even when the session environment pins another platform
# (e.g. JAX_PLATFORMS=axon for the tunneled TPU).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
# Compiles in this setup can be remote/slow; a persistent cache makes
# repeat test runs cheap.
jax.config.update("jax_compilation_cache_dir", "/tmp/xpic_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
