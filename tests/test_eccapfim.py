"""eccapfim end-to-end regression (small, the scheme is expensive).

Mirrors tests/eccapfim/eccapfim_ex1.cpp's conservation intent on a
reduced box: fully implicit scheme at dt far beyond the explicit CFL
must conserve energy and charge to solver tolerance.
"""

import os

import numpy as np

from xpic_tpu.commands import particles_load
from xpic_tpu.config import Config
from xpic_tpu.schemes import build_simulation

STEPS = 4


def make_config(tmp_path):
    doc = {
        "Simulation": "eccapfim",
        "OutputDirectory": str(tmp_path / "out_eccapfim"),
        "Geometry": {
            "x": 3.0, "y": 3.0, "z": 3.0, "t": STEPS * 1.0,
            "dx": 0.5, "dy": 0.5, "dz": 0.5, "dt": 1.0,
            "diagnose_period": STEPS,
            "da_boundary_x": "DM_BOUNDARY_PERIODIC",
            "da_boundary_y": "DM_BOUNDARY_PERIODIC",
            "da_boundary_z": "DM_BOUNDARY_PERIODIC",
        },
        "Particles": [
            {"sort_name": "electrons", "Np": 30, "n": 1.0, "q": -1.0,
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


def test_eccapfim_conservation(tmp_path):
    particles_load.seed(555)
    cfg = make_config(tmp_path)
    sim = build_simulation(cfg)
    sim.initialize()
    sim.calculate()
    sim.finalize()

    out = sim.cfg.out_dir
    header, rows = read_table(
        os.path.join(out, "temporal", "energy_conservation.txt")
    )
    total = rows[:, header.index("dE+dB+dK")]
    dK = rows[:, header.index("dK_electrons")]
    assert np.max(np.abs(dK[1:])) > 1e-8, "no dynamics happened"
    # Energy conservation limited by the nonlinear solve tolerance 1e-7
    # (the reference quotes the same budget, eccapfim/simulation.h:14-18).
    assert np.all(np.abs(total[1:]) < 2e-6)

    ch, crows = read_table(
        os.path.join(out, "temporal", "charge_conservation.txt")
    )
    n2 = crows[:, ch.index("N2dQ_tot")]
    # Path-split implicit Esirkepov conserves charge to roundoff.
    assert np.all(n2 < 1e-9)


def test_eccapfim_two_species_per_species_continuity(tmp_path):
    """Per-species charge-conservation columns must be species-local.

    The reference keeps a per-species current J (src/interfaces/
    particles.h:20) and the N1dQ_*/N2dQ_* columns compare each species'
    own d(rho_s)/dt against div J_s.  A bug that assigns the *summed*
    current to every species passes any single-species config but makes
    every per-species continuity norm O(|J_other|) here, where positrons
    and electrons carry opposite currents.
    """
    particles_load.seed(557)
    cfg = make_config(tmp_path)
    doc = dict(cfg.raw)
    doc["Particles"] = [
        {"sort_name": "electrons", "Np": 20, "n": 1.0, "q": -1.0,
         "m": 1.0, "T": 0.1},
        {"sort_name": "positrons", "Np": 20, "n": 1.0, "q": 1.0,
         "m": 1.0, "T": 0.1},
    ]
    doc["Presets"] = [
        {
            "command": "SetParticles",
            "particles": name,
            "coordinate": {"name": "CoordinateInBox"},
            "momentum": {"name": "MaxwellianMomentum", "tov": True},
        }
        for name in ("electrons", "positrons")
    ]
    cfg = Config.from_json(doc)
    sim = build_simulation(cfg)
    sim.initialize()
    sim.calculate()
    sim.finalize()

    out = sim.cfg.out_dir
    ch, crows = read_table(
        os.path.join(out, "temporal", "charge_conservation.txt")
    )
    for name in ("electrons", "positrons", "tot"):
        # Column titles are truncated to their 13-char width, matching
        # the reference's fixed-width TableDiagnostic layout.
        n2 = crows[1:, ch.index(("N2dQ_" + name)[:13])]
        assert np.all(n2 < 1e-9), f"continuity violated for {name}: {n2}"
    # The two species genuinely carry distinct, nonzero currents.
    Je = np.asarray(sim.species[0].J)
    Jp = np.asarray(sim.species[1].J)
    assert np.linalg.norm(Je) > 1e-12 and np.linalg.norm(Jp) > 1e-12
    assert np.linalg.norm(Je - Jp) > 1e-12
    assert np.allclose(Je + Jp, np.asarray(sim.J), atol=1e-12)


def test_eccapfim_fast_particle_is_flagged(tmp_path):
    """A particle moving >= 1 cell/axis/dt must be rejected loudly, never
    silently lose charge (the reference sub-steps arbitrary crossings
    with a DDA while-loop, cell_traversal.cpp:3-77; here the fixed
    4-segment split's domain is guarded instead)."""
    import jax.numpy as jnp
    import pytest

    from xpic_tpu.particles import ParticleArrays

    particles_load.seed(556)
    cfg = make_config(tmp_path)
    sim = build_simulation(cfg)
    sim.initialize()

    sp = sim.species[0]
    arr = sp.arrays
    p = np.array(arr.p)
    i = int(np.flatnonzero(np.asarray(arr.alive))[0])
    p[i] = (1.2, 0.0, 0.0)  # 1.2 c -> 2.4 cells per dt=1.0 along x
    sp.arrays = ParticleArrays(r=arr.r, p=jnp.asarray(p), alive=arr.alive)
    sp.count()

    with pytest.raises(RuntimeError, match="cells along one axis|converge"):
        sim.timestep_implementation(1)


def test_eccapfim_crosser_fast_path_matches_general(tmp_path):
    """The crosser-compaction fast path (kc > 0) must reproduce the
    general 4-segment evaluation exactly (up to float reassociation):
    non-crossers' single-segment gather/deposit is the same kernel with
    the three zero-length segments dropped, crossers run the identical
    4-segment path, and the in-row partition is undone on output."""
    import jax.numpy as jnp
    import pytest

    from xpic_tpu.schemes.eccapfim import _form_species

    particles_load.seed(558)
    cfg = make_config(tmp_path)
    doc = dict(cfg.raw)
    # Tame dt so only a few % of particles cross a face per step (the
    # production regime the fast path targets).
    doc["Geometry"] = dict(doc["Geometry"], dt=0.1, t=0.4)
    cfg = Config.from_json(doc)
    sim = build_simulation(cfg)
    sim.initialize()
    sp = sim.species[0]
    st = sp.state
    rng = np.random.default_rng(0)
    E = jnp.asarray(rng.normal(0.0, 1e-3, sim.E.shape), sim.E.dtype)
    B = jnp.asarray(rng.normal(0.0, 1e-3, sim.E.shape), sim.E.dtype)
    qm, a0 = sp.params.qm, sp.params.q * sp.params.n_Np
    K = st.p.shape[1]
    kc = max(2, K // 2)

    ref = _form_species(E, B, st, sim.geom, qm, a0, 0)
    fast = _form_species(E, B, st, sim.geom, qm, a0, kc)
    assert int(fast[6]) == 0, "conservative classifier overflowed/missed"
    names = ("J", "r_new", "p_new", "iters", "nonconv", "max_disp")
    for name, a, b in zip(names, ref, fast):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=0.0, atol=1e-12,
            err_msg=f"fast path diverged from general path in {name}",
        )
    # The run genuinely exercised the split: some (not all) rows hold a
    # crosser at this dt.
    steps = np.asarray(sim.geom.cell_steps)
    tn = np.asarray(fast[1]) / steps
    t0 = np.asarray(st.r) / steps
    crossed = (
        np.any(np.round(tn) != np.round(t0), axis=-1) & np.asarray(st.valid)
    )
    assert 0 < crossed.sum() < crossed.size


def test_eccapfim_crosser_overflow_is_flagged(tmp_path):
    """More classified crossers in one cell row than kc columns must
    raise the fallback flag (never silently run crossers through the
    single-segment kernel)."""
    import jax.numpy as jnp

    from xpic_tpu.schemes.eccapfim import _form_species

    particles_load.seed(559)
    cfg = make_config(tmp_path)
    sim = build_simulation(cfg)
    sim.initialize()
    sp = sim.species[0]
    st = sp.state
    E = jnp.zeros(sim.E.shape, sim.E.dtype)
    B = jnp.zeros(sim.E.shape, sim.E.dtype)
    qm, a0 = sp.params.qm, sp.params.q * sp.params.n_Np
    # dt=1.0, T=0.1 => ~0.6-cell moves: nearly every particle is a
    # classified crosser, so kc=1 must overflow somewhere.
    out = _form_species(E, B, st, sim.geom, qm, a0, 1)
    assert int(out[6]) >= 1
