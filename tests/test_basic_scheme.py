"""End-to-end regression of the `basic` scheme.

Mirrors tests/basic/basic_ex1.cpp: a 10^3 periodic plasma cube
(dx=0.05, dt=0.025, 100 ppc Maxwellian electrons at T=0.1 keV) run for a
number of steps; conservation properties are asserted directly —
the physics content of the reference's golden tables (bitwise table
parity is impossible without the reference's exact mt19937 stream).
"""

import json
import os

import numpy as np
import pytest

from xpic_tpu.commands import particles_load
from xpic_tpu.config import Config
from xpic_tpu.schemes import build_simulation

STEPS = 20


def make_config(tmp_path, scheme="basic", nt=STEPS):
    doc = {
        "Simulation": scheme,
        "OutputDirectory": str(tmp_path / "out"),
        "Geometry": {
            "x": 0.5, "y": 0.5, "z": 0.5, "t": nt * 0.025,
            "dx": 0.05, "dy": 0.05, "dz": 0.05, "dt": 0.025,
            "diagnose_period": nt,
            "da_boundary_x": "DM_BOUNDARY_PERIODIC",
            "da_boundary_y": "DM_BOUNDARY_PERIODIC",
            "da_boundary_z": "DM_BOUNDARY_PERIODIC",
        },
        "Particles": [
            {"sort_name": "electrons", "Np": 100, "n": 1.0, "q": -1.0,
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
    return Config.from_json(doc)


@pytest.fixture()
def sim(tmp_path):
    particles_load.seed(12345)
    cfg = make_config(tmp_path)
    simulation = build_simulation(cfg)
    simulation.initialize()
    yield simulation
    simulation.finalize()


def read_table(path):
    with open(path) as fh:
        header = fh.readline().split()
        rows = np.loadtxt(fh)
    if rows.ndim == 1:
        rows = rows[None, :]
    return header, rows


def test_basic_conservation(sim):
    sim.calculate()

    out = sim.cfg.out_dir
    header, rows = read_table(os.path.join(out, "temporal",
                                           "energy_conservation.txt"))
    assert header[:4] == ["Time", "dE", "dB", "dK_electrons"]
    total = rows[:, header.index("dE+dB+dK")]
    wk0 = None

    # Energy table sanity: kinetic energy ~ N * (3/2) * T/mec2 * 0.5...
    eh, erows = read_table(os.path.join(out, "temporal", "energy.txt"))
    wk = erows[:, eh.index("wK_electrons")]
    n_particles = sim.species[0].count()
    # 0.5*m*mpw*sum(p^2); <p^2> = 3*T/(m*mec2)
    expect = 0.5 * (1.0 / 100) * n_particles * 3 * 0.1 / 511.0
    np.testing.assert_allclose(wk[0], expect, rtol=0.05)

    # Leapfrog energy conservation: per-step error small compared to
    # the kinetic energy scale.
    assert np.all(np.abs(total[1:]) < 2e-5 * wk[0])

    # Charge conservation (Esirkepov): continuity-equation norms at
    # roundoff level, matching the reference's expected tables
    # (tests/basic/expected/.../charge_conservation.txt).
    ch, crows = read_table(os.path.join(out, "temporal",
                                        "charge_conservation.txt"))
    n2_tot = crows[:, ch.index("N2dQ_tot")]
    assert np.all(n2_tot < 1e-10)


def test_particle_count_preserved(sim):
    n0 = sim.species[0].count()
    sim.calculate()
    assert sim.species[0].count() == n0


def test_momentum_table_written(sim):
    sim.calculate()
    header, rows = read_table(
        os.path.join(sim.cfg.out_dir, "temporal", "momentum_conservation.txt")
    )
    assert "N2dP" in header
    # Total momentum error balances the qE impulse to reasonable accuracy.
    # (column titles truncate at 13 chars, as the reference's do)
    n2 = rows[:, header.index("N2dP_electron")]
    assert np.all(n2 < 1e-4)
