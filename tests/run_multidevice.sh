#!/bin/sh
# Run the test suite with an 8-virtual-device CPU mesh.
#
# The axon sitecustomize (PYTHONPATH=.axon_site) initializes the JAX
# backend at interpreter startup, which locks the CPU device count to 1
# before XLA_FLAGS can apply; stripping PYTHONPATH restores the virtual
# mesh (the analog of the reference's `mpiexec -np 2` test re-runs,
# tests/ecsim/CMakeLists.txt:16-18).
cd "$(dirname "$0")/.." || exit 1
exec env -u PYTHONPATH \
  JAX_PLATFORMS=cpu \
  XLA_FLAGS="--xla_force_host_platform_device_count=8" \
  python -m pytest "${@:-tests/}" -q
