"""Worker process for the multi-process decomposition test.

The literal analog of the reference re-running its golden binaries
under ``mpiexec -np 2`` (tests/ecsim/CMakeLists.txt:16-18): each worker
joins the distributed runtime via ``maybe_initialize_distributed``
(runtime/distributed.py — the PetscInitialize analog), then runs the
identical config-driven ecsim simulation over the global device mesh.
Spawned by tests/test_multiprocess.py with XPIC_COORDINATOR /
XPIC_NUM_PROCESSES / XPIC_PROCESS_ID set.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Same zstd hazard as tests/conftest.py: several workers write the
# compile cache concurrently, which is exactly the regime that
# segfaulted in jaxlib's zstd layer — block it so jax falls back to
# zlib, and keep the cache dir run-private (XPIC_TEST_CACHE from the
# spawning test).
sys.modules.setdefault("zstandard", None)

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("XPIC_TEST_CACHE", "/tmp/xpic_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)


def main() -> None:
    from xpic_tpu.runtime.distributed import maybe_initialize_distributed

    joined = maybe_initialize_distributed()
    assert joined, "worker did not join the distributed runtime"
    nproc = int(os.environ["XPIC_NUM_PROCESSES"])
    assert jax.process_count() == nproc, (
        f"process_count {jax.process_count()} != {nproc}"
    )
    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    assert n_global == n_local * nproc, (n_global, n_local, nproc)

    from xpic_tpu.commands import particles_load
    from xpic_tpu.config import Config
    from xpic_tpu.schemes import build_simulation

    particles_load.seed(7)
    out = os.environ["XPIC_TEST_OUT"]
    scheme = os.environ.get("XPIC_TEST_SCHEME", "ecsim")
    steps, dt, box = 3, 1.5, 4.0
    if scheme == "eccapfim":
        # The fully implicit scheme is ~2 orders costlier per step
        # (Anderson outer x CN sweeps); a 6^3 box and 2 steps keep the
        # 2-process bar affordable while still crossing shard
        # boundaries (z-sharded over 4 devices).
        steps, box = 2, 3.0
    doc = {
        "Simulation": scheme,
        "OutputDirectory": out,
        "Mesh": n_global,
        "Geometry": {
            "x": box, "y": box, "z": box, "t": steps * dt,
            "dx": 0.5, "dy": 0.5, "dz": 0.5, "dt": dt,
            "diagnose_period": 1,
            "da_boundary_x": "DM_BOUNDARY_PERIODIC",
            "da_boundary_y": "DM_BOUNDARY_PERIODIC",
            "da_boundary_z": "DM_BOUNDARY_PERIODIC",
        },
        "Particles": [
            {"sort_name": "electrons", "Np": 10, "n": 1.0, "q": -1.0,
             "m": 1.0, "T": 0.1}
        ],
        "Presets": [
            {"command": "SetParticles", "particles": "electrons",
             "coordinate": {"name": "CoordinateInBox"},
             "momentum": {"name": "MaxwellianMomentum", "tov": True}},
        ],
    }
    sim = build_simulation(Config.from_json(doc))
    sim.initialize()
    sim.calculate()
    sim.finalize()
    print(f"worker {jax.process_index()} done", flush=True)


if __name__ == "__main__":
    main()
