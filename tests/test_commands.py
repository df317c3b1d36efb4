"""Command layer: unit tests + the mirror-machine integration run.

Covers the four previously-unexercised commands (reference:
src/commands/{set_magnetic_field,fields_damping,inject_particles,
remove_particles}.cpp):

* coil field validated against the on-axis circular-loop closed form;
* damping energy bookkeeping closes against the field-energy drop;
* inject/remove particle counts and energy getters;
* a mirror-machine end-to-end run — ghosted z-bounds, coil field,
  cylinder damping, paired injection, outside-cylinder removal — with
  the energy table's Damped/Inj/Rm columns present and finite (the
  reference's headline use case).
"""

import math
import os

import jax.numpy as jnp
import numpy as np
import pytest

from xpic_tpu.commands import particles_load
from xpic_tpu.config import Config
from xpic_tpu.schemes import build_simulation


# -- SetMagneticField: coils ------------------------------------------------


def test_coil_on_axis_matches_biot_savart():
    """On the coil axis (r=0) the Biot-Savart integral has the closed
    form Bz(z) = 2 pi I R^2 / (R^2 + z^2)^{3/2}
    (set_magnetic_field.cpp:93-140 with r=0)."""
    from xpic_tpu.commands.set_magnetic_field import SetCoilsField

    R, I, z0 = 1.5, 0.8, 2.0
    coil = SetCoilsField([(z0, R, I)])
    z = np.linspace(-3.0, 7.0, 21)
    Br, Bz = coil._Br_Bz(z, np.zeros_like(z))  # _Br_Bz shifts by z0 itself
    analytic = 2.0 * math.pi * I * R**2 / (R**2 + (z - z0) ** 2) ** 1.5
    np.testing.assert_allclose(Bz, analytic, rtol=1e-10)
    np.testing.assert_allclose(Br, 0.0, atol=1e-12)


def test_mirror_field_midplane_and_symmetry():
    """Two-coil mirror: Bz on the midplane axis equals twice a single
    shifted loop's on-axis field; the field is stronger at the coil
    planes than at the midplane (mirror ratio > 1)."""
    from xpic_tpu.commands.set_magnetic_field import SetApproximateMirrorField

    D, R, I = 4.0, 1.0, 1.0
    m = SetApproximateMirrorField(D, R, I)

    # _B0 centers the coils at -D/2 and +D/2 around z=0.
    def Bz(z):
        return m._B0(z, +1) + m._B0(z, -1)

    analytic_mid = 2 * 0.5 * I * R**2 / (R**2 + (0.5 * D) ** 2) ** 1.5
    np.testing.assert_allclose(Bz(0.0), analytic_mid, rtol=1e-12)
    assert Bz(0.5 * D) > Bz(0.0)  # mirror ratio > 1
    np.testing.assert_allclose(Bz(0.5 * D), Bz(-0.5 * D), rtol=1e-12)


# -- shared config machinery -------------------------------------------------


def base_doc(tmp_path, name, nt=2, dt=0.5, nz=10):
    return {
        "Simulation": "ecsimcorr",
        "OutputDirectory": str(tmp_path / name),
        "Geometry": {
            "x": 4.0, "y": 4.0, "z": nz * 0.5, "t": nt * dt,
            "dx": 0.5, "dy": 0.5, "dz": 0.5, "dt": dt,
            "diagnose_period": 1,
            "da_boundary_x": "DM_BOUNDARY_PERIODIC",
            "da_boundary_y": "DM_BOUNDARY_PERIODIC",
            "da_boundary_z": "DM_BOUNDARY_PERIODIC",
        },
        "Particles": [
            {"sort_name": "electrons", "Np": 10, "n": 1.0, "q": -1.0,
             "m": 1.0, "T": 0.02}
        ],
        "Presets": [],
        "StepPresets": [],
    }


def read_table(path):
    with open(path) as fh:
        header = fh.readline().split()
        rows = np.loadtxt(fh)
    if rows.ndim == 1:
        rows = rows[None, :]
    return header, rows


# -- FieldsDamping ------------------------------------------------------------


def test_fields_damping_energy_bookkeeping(tmp_path):
    """The damped-energy counter must equal the actual field-energy drop
    (fields_damping.cpp + energy.cpp:166-170)."""
    particles_load.seed(11)
    doc = base_doc(tmp_path, "damp")
    doc["StepPresets"] = [{
        "command": "FieldsDamping",
        "geometry": {"name": "CylinderGeometry", "radius": 1.2,
                     "coefficient": 0.8},
    }]
    sim = build_simulation(Config.from_json(doc))
    sim.initialize()

    # Seed a field and apply the damping command once.
    rng = np.random.default_rng(3)
    sim.E = jnp.asarray(rng.standard_normal(np.shape(sim.E)))
    sim.B = jnp.asarray(rng.standard_normal(np.shape(sim.B)))
    e0 = 0.5 * float(jnp.sum(sim.E**2) + jnp.sum((sim.B - sim.B0) ** 2))

    cmd = sim.step_presets[0]
    cmd.execute(1)
    e1 = 0.5 * float(jnp.sum(sim.E**2) + jnp.sum((sim.B - sim.B0) ** 2))
    assert cmd.get_damped_energy() > 0.0
    np.testing.assert_allclose(cmd.get_damped_energy(), e0 - e1, rtol=1e-12)

    # Inside the keep-cylinder nothing is damped.
    factor = np.asarray(cmd.factor)[0]
    g = sim.geom
    X = (np.arange(g.nx) + 0.5) * g.dx
    Y = (np.arange(g.ny) + 0.5) * g.dy
    r = np.hypot(X[None, :] - 2.0, Y[:, None] - 2.0)
    assert np.all(factor[:, r < 1.0] == 1.0)
    assert factor.min() < 1.0


# -- Inject / Remove -----------------------------------------------------------


def test_inject_particles_counts_and_energy(tmp_path):
    particles_load.seed(12)
    doc = base_doc(tmp_path, "inject")
    doc["Particles"].append(
        {"sort_name": "ions", "Np": 10, "n": 1.0, "q": 1.0,
         "m": 100.0, "T": 0.02}
    )
    doc["StepPresets"] = [{
        "command": "InjectParticles",
        "ionized": "ions",
        "ejected": "electrons",
        "per_step_particles_num": 40,
        "coordinate": {"name": "CoordinateInCylinder", "radius": 1.0,
                       "height": 5.0},
        "momentum_i": {"name": "MaxwellianMomentum"},
        "momentum_e": {"name": "MaxwellianMomentum"},
    }]
    sim = build_simulation(Config.from_json(doc))
    sim.initialize()

    ions = sim.get_named_particles("ions")
    els = sim.get_named_particles("electrons")
    assert ions.count() == 0 and els.count() == 0

    cmd = sim.step_presets[0]
    cmd.execute(1)
    assert ions.count() == 40 and els.count() == 40
    assert cmd.get_ionized_energy() > 0.0
    assert cmd.get_ejected_energy() > 0.0
    # Pairs share coordinates (inject_particles.h:9-47).
    ri = np.asarray(ions.arrays.r)[np.asarray(ions.arrays.alive)]
    re = np.asarray(els.arrays.r)[np.asarray(els.arrays.alive)]
    np.testing.assert_allclose(np.sort(ri, axis=0), np.sort(re, axis=0))

    cmd.execute(2)
    assert ions.count() == 80 and els.count() == 80

    # Injected coordinates lie inside the cylinder.
    rr = np.hypot(ri[:, 0] - 2.0, ri[:, 1] - 2.0)
    assert np.all(rr <= 1.0 + 1e-12)


def test_remove_particles_counts_and_energy(tmp_path):
    particles_load.seed(13)
    doc = base_doc(tmp_path, "remove")
    doc["Presets"] = [{
        "command": "SetParticles",
        "particles": "electrons",
        "coordinate": {"name": "CoordinateInBox"},
        "momentum": {"name": "MaxwellianMomentum"},
    }]
    doc["StepPresets"] = [{
        "command": "RemoveParticles",
        "particles": "electrons",
        "geometry": {"name": "CylinderGeometry", "radius": 1.0},
    }]
    sim = build_simulation(Config.from_json(doc))
    sim.initialize()
    sp = sim.species[0]
    n0 = sp.count()
    assert n0 > 0

    cmd = sim.step_presets[0]
    cmd.execute(1)
    n1 = sp.count()
    assert 0 < n1 < n0  # outside-cylinder particles removed
    assert cmd.get_removed_energy() > 0.0

    # Survivors are inside the keep cylinder.
    alive = np.asarray(sp.arrays.alive)
    r = np.asarray(sp.arrays.r)[alive]
    rr = np.hypot(r[:, 0] - 2.0, r[:, 1] - 2.0)
    assert np.all(rr < 1.0 + 1e-12)


# -- Mirror machine (integration) ----------------------------------------------


def test_mirror_machine_end_to_end(tmp_path):
    """The reference's headline scenario: open (ghosted) z boundaries, a
    coil mirror field, absorbing cylinder damping, paired injection and
    outside-cylinder removal, with the energy table carrying the
    Damped/Inj/Rm source-sink columns (energy.cpp:160-180)."""
    particles_load.seed(14)
    nt, dt = 3, 0.5
    doc = base_doc(tmp_path, "mirror", nt=nt, dt=dt, nz=12)
    doc["Geometry"]["da_boundary_z"] = "DM_BOUNDARY_GHOSTED"
    doc["Presets"] = [
        {"command": "SetMagneticField",
         "field": {"name": "SetCoilsField",
                   "coils": [{"z0": 1.0, "R": 1.5, "I": 0.05},
                             {"z0": 5.0, "R": 1.5, "I": 0.05}]}},
        {"command": "SetParticles",
         "particles": "electrons",
         "coordinate": {"name": "CoordinateInCylinder", "radius": 1.0,
                        "height": 4.0},
         "momentum": {"name": "MaxwellianMomentum"}},
    ]
    doc["StepPresets"] = [
        {"command": "InjectParticles",
         "ionized": "ions", "ejected": "electrons",
         "per_step_particles_num": 20,
         "coordinate": {"name": "CoordinateInCylinder", "radius": 0.5,
                        "height": 2.0},
         "momentum_i": {"name": "MaxwellianMomentum"},
         "momentum_e": {"name": "MaxwellianMomentum"}},
        {"command": "RemoveParticles",
         "particles": "electrons",
         "geometry": {"name": "CylinderGeometry", "radius": 1.8}},
        {"command": "FieldsDamping",
         "geometry": {"name": "CylinderGeometry", "radius": 1.6,
                      "coefficient": 0.8}},
    ]
    doc["Particles"].append(
        {"sort_name": "ions", "Np": 10, "n": 1.0, "q": 1.0,
         "m": 100.0, "T": 0.02}
    )
    sim = build_simulation(Config.from_json(doc))
    sim.initialize()

    # The coil field landed in B0 (and B) with the mirror shape.
    B0z = np.asarray(sim.B0)[2]
    assert B0z.max() > 0.0
    sim.calculate()
    sim.finalize()

    header, rows = read_table(
        os.path.join(sim.cfg.out_dir, "temporal", "energy_conservation.txt")
    )
    for col in ("Damped(E+B)", "Inj_ions", "Inj_electrons", "Rm_electrons",
                "dE+dB+dK"):
        assert col in header, f"missing column {col}"
    assert np.isfinite(rows).all()
    inj = rows[:, header.index("Inj_ions")]
    assert np.any(inj > 0.0)  # injection really happened
    # Particles survived the run and the fields stayed finite.
    assert sim.get_named_particles("ions").count() > 0
    assert np.isfinite(np.asarray(sim.E)).all()
