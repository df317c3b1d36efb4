"""Langmuir-wave physics validation.

The reference ships a Langmuir-wave example as its default config
(config.json: 2x2x32 periodic box, electrons with a cosine velocity
perturbation along z).  A cold plasma with n = 1 oscillates at the
plasma frequency — w = 1 in the code's dimensionless units — so the
measured E_z oscillation period must be 2*pi/w_pe.  This validates the
whole chain: loading, deposit, field solve, push.
"""

import numpy as np
import pytest

from xpic_tpu.commands import particles_load
from xpic_tpu.config import Config
from xpic_tpu.schemes import build_simulation


def make_config(tmp_path, scheme, dt, nt):
    doc = {
        "Simulation": scheme,
        "OutputDirectory": str(tmp_path / f"out_{scheme}"),
        "Geometry": {
            "x": "2 [dx]", "y": "2 [dy]", "z": "16 [dz]", "t": nt * dt,
            "dx": 0.5, "dy": 0.5, "dz": 0.5, "dt": dt,
            "diagnose_period": nt,
            "da_boundary_x": "DM_BOUNDARY_PERIODIC",
            "da_boundary_y": "DM_BOUNDARY_PERIODIC",
            "da_boundary_z": "DM_BOUNDARY_PERIODIC",
        },
        "Particles": [
            {"sort_name": "electrons", "Np": 100, "n": 1.0, "q": -1.0,
             "m": 1.0, "T": 0.01}
        ],
        "Presets": [
            {
                "command": "SetParticles",
                "particles": "electrons",
                "coordinate": {"name": "CoordinateInBox"},
                "momentum": {
                    "name": "MaxwellCosinePerturbation",
                    "amplitude": [0, 0, 3],
                    "wave_number": [0, 0, 1],
                },
            }
        ],
        "Diagnostics": [],
    }
    return Config.from_json(doc)


def test_langmuir_frequency_basic(tmp_path):
    """E_z energy oscillates at 2*w_pe (energy is amplitude-squared)."""
    particles_load.seed(2024)
    dt, nt = 0.1, 63  # one full plasma period = 2 pi
    cfg = make_config(tmp_path, "basic", dt, nt)
    sim = build_simulation(cfg)
    sim.initialize()

    import jax.numpy as jnp

    wE = []
    for t in range(1, nt + 1):
        for cmd in sim.step_presets:
            cmd.execute(t)
        sim.timestep_implementation(t)
        wE.append(float(jnp.sum(sim.E[2] ** 2)))
    sim.finalize()

    wE = np.asarray(wE)
    assert wE.max() > 1e-6, "no Langmuir oscillation developed"

    # Field energy ~ sin^2(w t) has period pi/w_pe; find it from the
    # autocorrelation-free zero crossings of (wE - mean).
    sig = wE - wE.mean()
    crossings = np.where(np.diff(np.sign(sig)) != 0)[0]
    assert len(crossings) >= 3, "too few oscillations detected"
    # Half-period between successive crossings
    periods = 2 * np.diff(crossings) * dt
    measured = np.mean(periods)
    expected = np.pi  # energy period = pi / w_pe
    assert abs(measured - expected) / expected < 0.15, (
        f"Langmuir energy period {measured:.3f} vs {expected:.3f}"
    )
