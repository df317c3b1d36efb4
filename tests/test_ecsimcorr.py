"""Targeted ecsimcorr unit tests (localize failures without the golden run).

The golden-parity chain (tests/test_golden.py) detects ecsimcorr
regressions end-to-end; these tests pin the two pieces unique to the
scheme — the velocity renormalization λ = sqrt(1 + dt (corr_w −
pred_w)/K) (src/impls/ecsimcorr/particles.cpp:93-126) and the charge-
conserving ``correct`` solve on the constant SPD matM
(src/impls/ecsimcorr/simulation.cpp:52-63,114-136) — against hand-built
states with closed-form expectations.
"""

import numpy as np
import jax.numpy as jnp

from xpic_tpu.config import Geometry
from xpic_tpu.diagnostics.charge_conservation import charge_density
from xpic_tpu.ops.binning import BinnedState, bin_state
from xpic_tpu.ops.stencil import curl_negative, curl_positive, divergence_negative
from xpic_tpu.particles import ParticleArrays
from xpic_tpu.schemes.ecsimcorr import (
    _correct_fields,
    _half_drift_deposit,
    _renormalize,
)

GEOM = Geometry(dx=0.5, dy=0.5, dz=0.5, dt=1.5, nx=6, ny=6, nz=6, nt=1)


def _two_particle_state(geom=GEOM, slots=8):
    """Two particles with known momenta in distinct cells."""
    r = jnp.asarray([[0.8, 0.9, 1.1], [2.1, 2.2, 2.3]])
    p = jnp.asarray([[0.02, -0.01, 0.005], [-0.03, 0.015, 0.01]])
    sp = ParticleArrays(r=r, p=p, alive=jnp.ones(2, bool))
    return bin_state(sp, geom, slots), np.asarray(p)


def test_renormalize_lambda_statistics():
    """λ and the five bookkeeping stats match the closed form on a
    hand-built two-particle state (ecsimcorr/particles.cpp:93-126)."""
    st, p_host = _two_particle_state()
    m, mpw, q = 1.0, 0.5, -1.0

    rng = np.random.default_rng(7)
    shape = (3, GEOM.nz, GEOM.ny, GEOM.nx)
    currJe = jnp.asarray(rng.standard_normal(shape) * 1e-3)
    Ec = jnp.asarray(rng.standard_normal(shape) * 1e-3)
    pred_w = jnp.asarray(2.5e-7)
    K = 0.5 * m * mpw * float(np.sum(p_host**2))
    K0 = jnp.asarray(K * 0.98)  # pretend the push changed K by 2%

    # _renormalize donates st — snapshot the inputs first.
    p_before = np.asarray(st.p)
    st2, stats = _renormalize(st, currJe, Ec, pred_w, K0, GEOM, m * mpw)
    s = np.asarray(stats)

    corr_w = float(np.sum(np.asarray(currJe) * np.asarray(Ec)))
    lam2 = 1.0 + GEOM.dt * (corr_w - float(pred_w)) / K
    # stats = [lambda_dK, pred_dK, corr_dK, pred_w, corr_w]
    assert np.isclose(s[0], (lam2 - 1.0) * K, rtol=1e-12)
    assert np.isclose(s[1], K - float(K0), rtol=1e-12)
    assert np.isclose(s[2], lam2 * K - float(K0), rtol=1e-12)
    assert np.isclose(s[3], float(pred_w), rtol=1e-12)
    assert np.isclose(s[4], corr_w, rtol=1e-12)

    # every live momentum scaled by the same sqrt(lam2)
    v = np.asarray(st2.valid)
    ratio = np.asarray(st2.p)[v] / p_before[v]
    assert np.allclose(ratio, np.sqrt(lam2), rtol=1e-12)
    # total kinetic energy after scaling = lam2 * K exactly
    K_new = 0.5 * m * mpw * float(np.sum(np.asarray(st2.p)[v] ** 2))
    assert np.isclose(K_new, lam2 * K, rtol=1e-12)


def test_renormalize_identity_when_balanced():
    """corr_w == pred_w (and K == K0) → λ = 1, momenta unchanged."""
    st, _ = _two_particle_state()
    m_mpw = 0.5
    zero = jnp.zeros((3, GEOM.nz, GEOM.ny, GEOM.nx))
    from xpic_tpu.ops.binning import kinetic_energy_state

    K0 = kinetic_energy_state(st, m_mpw)
    p_before = np.asarray(st.p)
    st2, stats = _renormalize(st, zero, zero, jnp.asarray(0.0), K0,
                              GEOM, m_mpw)
    s = np.asarray(stats)
    assert np.allclose(s[:3], 0.0, atol=1e-18)
    assert np.allclose(np.asarray(st2.p), p_before)


def test_correct_fields_residual_and_convergence():
    """The correct solve reaches the KSP budget ‖matM Ec − rhs‖ ≤ 1e-7
    on a rough rhs (constant SPD matM, ecsimcorr/simulation.cpp:118-133)."""
    rng = np.random.default_rng(3)
    shape = (3, GEOM.nz, GEOM.ny, GEOM.nx)
    E = jnp.asarray(rng.standard_normal(shape) * 1e-2)
    B = jnp.asarray(rng.standard_normal(shape) * 1e-2)
    B0 = jnp.zeros(shape)
    currJe = jnp.asarray(rng.standard_normal(shape) * 1e-2)

    Ec, iters, rnorm, ok = _correct_fields(E, B, B0, currJe, GEOM)
    assert bool(ok)
    assert int(iters) <= 25  # Chebyshev-preconditioned CG stays cheap

    steps, bounds = GEOM.cell_steps, GEOM.bounds
    half_dt2 = 0.5 * GEOM.dt * GEOM.dt
    lhs = 2.0 * Ec + half_dt2 * curl_negative(
        curl_positive(Ec, steps, bounds), steps, bounds
    )
    rhs = 2.0 * E - GEOM.dt * currJe + GEOM.dt * curl_negative(
        B - B0, steps, bounds
    )
    res = float(jnp.linalg.norm((lhs - rhs).ravel()))
    assert res <= 1.1e-7 * max(1.0, float(jnp.linalg.norm(rhs.ravel())))


def test_half_drift_deposit_continuity():
    """The half-drift Esirkepov deposit satisfies the discrete continuity
    equation ∂ρ/∂t + div J = 0 at roundoff (the property the correct
    solve relies on; esirkepov_decomposition.cpp:20-103)."""
    rng = np.random.default_rng(11)
    n = 200
    sp = ParticleArrays(
        r=jnp.asarray(rng.random((n, 3)) * np.array(GEOM.L)),
        p=jnp.asarray(rng.standard_normal((n, 3)) * 0.05),
        alive=jnp.ones(n, bool),
    )
    st = bin_state(sp, GEOM, 16)
    q_nNp = -1.0 * 0.2

    rho0 = charge_density(st, GEOM, q_nNp)
    alpha = q_nNp / (6.0 * GEOM.dt)
    st2, J_inc, load = _half_drift_deposit(st, GEOM, alpha)
    assert int(np.asarray(load)[1]) == 0
    rho1 = charge_density(st2, GEOM, q_nNp)

    # One half-deposit with alpha = q n/Np / (6 dt) satisfies the
    # discrete continuity equation against the half-move density change
    # over the full dt: (rho_half - rho_0)/dt + div J_inc = 0 (the two
    # half-deposits of a step then sum to the step's conserving J,
    # ecsimcorr/particles.cpp:27-92).
    ddt = (rho1 - rho0) / GEOM.dt
    divJ = divergence_negative(J_inc, GEOM.cell_steps, GEOM.bounds)
    resid = np.asarray(ddt + divJ)
    np.testing.assert_allclose(resid, 0.0, atol=1e-12)


def test_current_consistency_norm_logged_and_small(tmp_path, caplog):
    """The scheme-health invariant ||currJe - (currI + matL Ec)|| is
    computed every step via the (possibly matrix-free) mass apply and
    logged, matching the reference's per-step norm
    (src/impls/ecsimcorr/simulation.cpp:76-83).  At a quiet thermal
    config it must stay at the two deposits' discretization scale."""
    import logging

    from xpic_tpu.commands import particles_load
    from xpic_tpu.config import Config
    from xpic_tpu.schemes import build_simulation

    particles_load.seed(11)
    cfg = Config.from_json({
        "Simulation": "ecsimcorr",
        "OutputDirectory": str(tmp_path / "out"),
        "Geometry": {
            "x": 3.0, "y": 3.0, "z": 3.0, "t": 4.5,
            "dx": 0.5, "dy": 0.5, "dz": 0.5, "dt": 1.5,
            "diagnose_period": 4.5,
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
             "momentum": {"name": "MaxwellianMomentum", "tov": True}}
        ],
        "Diagnostics": [],
    })
    sim = build_simulation(cfg)
    sim.initialize()
    with caplog.at_level(logging.INFO, logger="xpic"):
        sim.calculate()
    sim.finalize()

    norm = sim.current_consistency_norm
    assert np.isfinite(norm) and norm > 0.0
    # The two currents differ by the half-step decomposition error of
    # the Esirkepov deposit vs the implicit-moment form — O(v dt)
    # relative; at T=0.1, 10 ppc this lands well under 0.1.
    assert norm < 0.1
    assert "ECSIM and Esirkepov currents" in caplog.text
