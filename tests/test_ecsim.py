"""ECSIM / ecsimcorr end-to-end regression.

Mirrors tests/ecsim/ecsim_ex1.cpp and tests/ecsimcorr/ecsimcorr_ex1.cpp:
a 10^3 periodic plasma cube, dx=0.5, **dt=1.5** (far beyond the explicit
CFL — the whole point of the semi-implicit scheme), 100 ppc Maxwellian
electrons at T=0.1 keV.  Asserts the schemes' defining conservation
properties instead of golden tables (see test_basic_scheme.py).
"""

import os

import numpy as np
import pytest

from xpic_tpu.commands import particles_load
from xpic_tpu.config import Config
from xpic_tpu.schemes import build_simulation

STEPS = 10


def make_config(tmp_path, scheme, nt=STEPS):
    doc = {
        "Simulation": scheme,
        "OutputDirectory": str(tmp_path / ("out_" + scheme)),
        "Geometry": {
            "x": 5.0, "y": 5.0, "z": 5.0, "t": nt * 1.5,
            "dx": 0.5, "dy": 0.5, "dz": 0.5, "dt": 1.5,
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


def read_table(path):
    with open(path) as fh:
        header = fh.readline().split()
        rows = np.loadtxt(fh)
    if rows.ndim == 1:
        rows = rows[None, :]
    return header, rows


def run(tmp_path, scheme):
    particles_load.seed(777)
    cfg = make_config(tmp_path, scheme)
    sim = build_simulation(cfg)
    sim.initialize()
    sim.calculate()
    sim.finalize()
    return sim


def test_ecsim_energy_conservation(tmp_path):
    sim = run(tmp_path, "ecsim")
    header, rows = read_table(
        os.path.join(sim.cfg.out_dir, "temporal", "energy_conservation.txt")
    )
    total = rows[:, header.index("dE+dB+dK")]
    dK = rows[:, header.index("dK_electrons")]
    # The semi-implicit scheme takes O(1e-4)-sized energy exchanges yet
    # conserves their sum to the solver tolerance (reference expected
    # table: ~1e-13 at rtol 1e-7).
    assert np.max(np.abs(dK[1:])) > 1e-6, "no dynamics happened"
    assert np.all(np.abs(total[1:]) < 1e-9)


def test_ecsimcorr_conservation(tmp_path):
    sim = run(tmp_path, "ecsimcorr")
    out = sim.cfg.out_dir
    header, rows = read_table(
        os.path.join(out, "temporal", "energy_conservation.txt")
    )
    total = rows[:, header.index("dE+dB+dK")]
    assert np.all(np.abs(total[1:]) < 1e-9)

    # The charge-conserving correction drives the continuity residual of
    # the Esirkepov current to roundoff
    # (tests/ecsimcorr expected charge_conservation.txt ~ 1e-12).
    ch, crows = read_table(os.path.join(out, "temporal",
                                        "charge_conservation.txt"))
    n2 = crows[:, ch.index("N2dQ_tot")]
    assert np.all(n2 < 1e-10)

    # Energy renormalization bookkeeping columns exist.
    assert "CWD_electrons" in header
    assert "WD" in header
    wd = rows[:, header.index("WD")]
    assert np.all(np.abs(wd[1:]) < 1e-9)
