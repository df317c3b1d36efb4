"""Host-phased scheme vs fused single-jit step: one source of truth.

The CLI/tests drive the phase-split ``EcsimSimulation`` while the bench
and the multichip dryrun drive the fused ``ecsim_step_binned``; both are
built from the same phase kernels (parallel/step.py), and this test pins
that: same state in -> same state out.

The reference has a single implementation, exercised identically by its
tests and production runs (src/impls/ecsim/simulation.cpp) — this is the
TPU repo's equivalent guarantee.
"""

import jax.numpy as jnp
import numpy as np

from xpic_tpu.config import Config
from xpic_tpu.parallel.step import ecsim_step_binned
from xpic_tpu.schemes import build_simulation


def make_sim(tmp_path, nt=1):
    doc = {
        "Simulation": "ecsim",
        "OutputDirectory": str(tmp_path / "out_parity"),
        "Geometry": {
            "x": 4.0, "y": 4.0, "z": 4.0, "t": nt * 1.5,
            "dx": 0.5, "dy": 0.5, "dz": 0.5, "dt": 1.5,
            "diagnose_period": nt,
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
    return sim


def test_ecsim_host_phased_matches_fused(tmp_path):
    sim = make_sim(tmp_path)
    sp = sim.species[0]
    geom = sim.geom

    E0, B0v, B00 = sim.E, sim.B, sim.B0
    st0 = sp.state
    pr = sp.params

    E_f, B_f, st_f, currI_f, _ = ecsim_step_binned(
        E0, B0v, B00, st0, geom, q=pr.q, m=pr.m, mpw=pr.n_Np
    )
    # Materialize before the host-phased step donates st0's buffers.
    E_f, B_f, currI_f = map(np.asarray, (E_f, B_f, currI_f))
    r_f, p_f, v_f = map(np.asarray, (st_f.r, st_f.p, st_f.valid))

    sim.timestep_implementation(1)

    np.testing.assert_allclose(np.asarray(sim.E), E_f, rtol=0, atol=1e-14)
    np.testing.assert_allclose(np.asarray(sim.B), B_f, rtol=0, atol=1e-14)
    np.testing.assert_allclose(np.asarray(sim.J), currI_f, rtol=0, atol=1e-14)
    # The scheme may grow K mid-step (check_load headroom policy), so
    # compare the particle *contents*, not the slot layout: per-cell
    # populations must match exactly, and the lexicographically sorted
    # (r, p) rows must agree to the same tolerance as the fields.
    st_s = sim.species[0].state
    v_s = np.asarray(st_s.valid)
    assert np.array_equal(v_s.sum(axis=1), v_f.sum(axis=1))

    def packed(r, p, v):
        rows = np.concatenate([r[v], p[v]], axis=1)
        return rows[np.lexsort(rows.T[::-1])]

    np.testing.assert_allclose(
        packed(np.asarray(st_s.r), np.asarray(st_s.p), v_s),
        packed(r_f, p_f, v_f), rtol=0, atol=1e-14)
