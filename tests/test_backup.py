"""SimulationBackup round trip and file-format contract.

Mirrors tests/diagnostics/simulation_backup.cpp: construct known fields
and particles, save, clobber, reload, compare exactly; check the binary
size contracts (fields file = 8 + 3*8*N^3 bytes for 32-bit header ints,
particles file = 6*8*Np bytes; simulation_backup.cpp:76-82).
"""

import os

import jax.numpy as jnp
import numpy as np

from xpic_tpu.commands import particles_load
from xpic_tpu.config import Config
from xpic_tpu.diagnostics.simulation_backup import SimulationBackup
from xpic_tpu.schemes import build_simulation


def make_sim(tmp_path, nt=4):
    doc = {
        "Simulation": "basic",
        "OutputDirectory": str(tmp_path / "out"),
        "Geometry": {
            "x": 0.5, "y": 0.5, "z": 0.5, "t": nt * 0.025,
            "dx": 0.05, "dy": 0.05, "dz": 0.05, "dt": 0.025,
            "diagnose_period": 2,
            "da_boundary_x": "DM_BOUNDARY_PERIODIC",
            "da_boundary_y": "DM_BOUNDARY_PERIODIC",
            "da_boundary_z": "DM_BOUNDARY_PERIODIC",
        },
        "Particles": [
            {"sort_name": "electrons", "Np": 10, "n": 1.0, "q": -1.0,
             "m": 1.0, "T": 0.1}
        ],
        "Presets": [
            {
                "command": "SetParticles",
                "particles": "electrons",
                "coordinate": {"name": "CoordinateInBox"},
                "momentum": {"name": "MaxwellianMomentum", "tov": True},
            }
        ],
        "Diagnostics": [],
    }
    cfg = Config.from_json(doc)
    sim = build_simulation(cfg)
    sim.initialize()
    return sim


def test_backup_roundtrip(tmp_path):
    particles_load.seed(99)
    sim = make_sim(tmp_path)
    rng = np.random.default_rng(1)
    sim.E = jnp.asarray(rng.standard_normal(sim.E.shape))
    sim.B = jnp.asarray(rng.standard_normal(sim.B.shape))

    backup = SimulationBackup(sim, period=2)
    backup.save(2)

    # File-format contracts
    g = sim.geom
    n3 = g.nx * g.ny * g.nz
    d = os.path.join(sim.cfg.out_dir, "simulation_backup", "2")
    assert os.path.getsize(os.path.join(d, "E")) == 8 + 3 * 8 * n3
    n_particles = sim.species[0].count()
    assert os.path.getsize(
        os.path.join(d, "electrons")
    ) == 6 * 8 * n_particles

    E_saved = np.asarray(sim.E)
    r_saved = np.asarray(sim.species[0].arrays.r)
    alive_saved = np.asarray(sim.species[0].arrays.alive)
    r_alive = np.sort(r_saved[alive_saved], axis=0)

    # Clobber state, then restore.
    sim.E = jnp.zeros_like(sim.E)
    sim.species[0].arrays = sim.species[0].arrays.__class__(
        r=jnp.zeros_like(sim.species[0].arrays.r),
        p=jnp.zeros_like(sim.species[0].arrays.p),
        alive=jnp.zeros_like(sim.species[0].arrays.alive),
    )
    backup.load(2)

    np.testing.assert_array_equal(np.asarray(sim.E), E_saved)
    arr = sim.species[0].arrays
    alive = np.asarray(arr.alive)
    assert alive.sum() == n_particles
    # Restored set equals saved set (order may change through reload+sort).
    np.testing.assert_allclose(
        np.sort(np.asarray(arr.r)[alive], axis=0), r_alive, rtol=0, atol=0
    )
    sim.finalize()


def test_backup_rolling_window(tmp_path):
    particles_load.seed(100)
    sim = make_sim(tmp_path)
    backup = SimulationBackup(sim, period=1)
    for t in range(1, 5):
        backup.diagnose(t)
    base = os.path.join(sim.cfg.out_dir, "simulation_backup")
    kept = sorted(n for n in os.listdir(base) if n.isdigit())
    # num_periods_being_kept = 2 (simulation_backup.cpp:46)
    assert kept == ["3", "4"]
    sim.finalize()


def test_backup_save_sources(tmp_path):
    """`save_sources: true` copies the framework tree into <backup>/src
    (Configuration::save_sources, src/utils/configuration.cpp:38-47)."""
    sim = make_sim(tmp_path)
    backup = SimulationBackup.from_json(sim, {"save_sources": True})
    src = os.path.join(backup.out_dir, "src")
    assert os.path.isfile(os.path.join(src, "config.py"))
    assert os.path.isfile(
        os.path.join(src, "diagnostics", "simulation_backup.py"))
    assert not any("__pycache__" in d for d, _, _ in os.walk(src))
