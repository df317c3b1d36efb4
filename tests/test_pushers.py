"""Gyration invariants of the particle pushers.

Modeled on the reference's analytic-field unit tests
(tests/boris_push/boris_push_ex1.cpp:25-70,
tests/crank_nicolson_push/crank_nicolson_push_ex1.cpp:13-51): uniform
B = B0 z_hat, velocity in the plane; check exact energy conservation,
the rotation sense (q<0 in B=+z rotates counterclockwise: v x B force),
and the per-step rotation angle implied by each Chin variant.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from xpic_tpu import pushers

B0 = 2.0
QM = -1.0  # electron-like


def run_rotation(update, dt, steps=1000):
    import jax

    p = jnp.asarray([[0.0, 0.5, 0.1]])
    B = jnp.asarray([[0.0, 0.0, B0]])

    @jax.jit
    def sweep(p):
        def body(p, _):
            p = update(dt, QM, p, B)
            return p, p[0]

        return jax.lax.scan(body, p, None, length=steps)[1]

    return np.asarray(sweep(p))


@pytest.mark.parametrize("name", ["M", "B", "C1", "C2"])
def test_energy_exact_conservation(name):
    """Roundoff-only energy drift: the reference budget is PETSC_SMALL
    (1e-10) over 1e5 steps (boris_push_ex1.cpp:63-70), i.e. ~1e-15/step;
    2000 steps here -> 2e-12."""
    dt = 0.1
    traj = run_rotation(pushers.BORIS_VARIANTS[name], dt, steps=2000)
    speeds = np.linalg.norm(traj, axis=1)
    np.testing.assert_allclose(speeds, speeds[0], rtol=2e-12)


@pytest.mark.parametrize("name", ["M", "B", "C1", "C2"])
def test_vz_invariant(name):
    dt = 0.1
    traj = run_rotation(pushers.BORIS_VARIANTS[name], dt, steps=500)
    np.testing.assert_allclose(traj[:, 2], 0.1, rtol=1e-13)


def effective_angle(name, dt):
    """Per-step rotation angle of each variant
    (reference formulas: boris_push.cpp:60-83)."""
    theta = -QM * B0 * dt
    if name == "M":
        return theta
    if name == "B":
        d = 1 + 0.25 * theta**2
        return np.arctan2(theta / d, (1 - 0.25 * theta**2) / d)
    if name == "C1":
        return np.arctan2(
            theta * np.sqrt(1 - 0.25 * theta**2), 1 - 0.5 * theta**2
        )
    if name == "C2":
        return np.arctan2(theta, np.sqrt(1 - theta**2))
    raise ValueError(name)


@pytest.mark.parametrize("name", ["M", "B", "C1", "C2"])
def test_rotation_angle(name):
    dt = 0.1
    traj = run_rotation(pushers.BORIS_VARIANTS[name], dt, steps=200)
    v0 = np.array([0.0, 0.5])
    v1 = traj[0, :2]
    step_angle = np.arctan2(
        v0[0] * v1[1] - v0[1] * v1[0], v0 @ v1
    )
    expected = effective_angle(name, dt)
    # For electron (q<0) in B=+z, theta = -qm*B*dt > 0; the reference's
    # rotation v -> cos*v_t + sin*(b x v_t) then advances by +theta.
    # (atol limited by the backend's reduced-precision f64 trig.)
    np.testing.assert_allclose(step_angle, expected, atol=1e-7)


def test_vEB_zero_E_matches_vB():
    """With E=0, vEB reduces to the classic Boris rotation
    (boris_push.cpp:48-57 vs :65-70)."""
    dt = 0.05
    p = jnp.asarray([[0.3, -0.2, 0.7]])
    B = jnp.asarray([[0.4, -1.0, 2.0]])
    E = jnp.zeros((1, 3))
    a = pushers.update_vEB(dt, QM, p, E, B)
    b = pushers.update_vB(dt, QM, p, B)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)


def test_vEB_pure_E_acceleration():
    dt = 0.1
    p = jnp.zeros((1, 3))
    E = jnp.asarray([[1.0, 0.0, 0.0]])
    B = jnp.zeros((1, 3))
    out = pushers.update_vEB(dt, QM, p, E, B)
    np.testing.assert_allclose(np.asarray(out), [[QM * dt, 0.0, 0.0]], rtol=1e-14)


def test_exb_drift():
    """Crossed fields produce the E x B drift on average."""
    import jax

    dt = 0.05
    E = jnp.asarray([[0.0, 0.1, 0.0]])
    B = jnp.asarray([[0.0, 0.0, 1.0]])
    p0 = jnp.asarray([[0.1, 0.0, 0.0]])
    drift = np.array([0.1 / 1.0, 0.0, 0.0])  # (E x B)/B^2

    @jax.jit
    def sweep(p):
        def body(p, _):
            p = pushers.update_vEB(dt, QM, p, E, B)
            return p, p[0]

        return jax.lax.scan(body, p, None, length=2000)[1]

    mean_v = np.mean(np.asarray(sweep(p0)), axis=0)
    np.testing.assert_allclose(mean_v, drift, atol=5e-3)


# -- Crank-Nicolson ---------------------------------------------------


def uniform_fields(E, B):
    def fn(rn, r0):
        n = rn.shape[0]
        return (
            jnp.broadcast_to(jnp.asarray(E), (n, 3)),
            jnp.broadcast_to(jnp.asarray(B), (n, 3)),
        )
    return fn


@pytest.mark.parametrize("omega_dt", [0.1, 0.5, 1.0])
def test_crank_nicolson_gyration(omega_dt):
    """CN in uniform B: exact energy conservation and the implicit
    midpoint rotation angle 2*atan(theta/2)
    (crank_nicolson_push.cpp:51-67)."""
    dt = omega_dt / B0
    fields = uniform_fields([0.0, 0.0, 0.0], [0.0, 0.0, B0])
    r = jnp.zeros((1, 3))
    p = jnp.asarray([[0.0, 0.4, 0.0]])
    speeds = []
    for _ in range(200):
        res = pushers.crank_nicolson_push(dt, QM, r, p, fields,
                                          atol=1e-13, rtol=1e-13)
        assert bool(res.converged.all())
        r, p = res.r, res.p
        speeds.append(float(jnp.linalg.norm(p)))
    np.testing.assert_allclose(speeds, 0.4, rtol=1e-10)


def test_crank_nicolson_exb():
    dt = 0.2
    fields = uniform_fields([0.0, 0.05, 0.0], [0.0, 0.0, 1.0])
    r = jnp.zeros((1, 3))
    p = jnp.asarray([[0.05, 0.0, 0.0]])
    rs = [np.asarray(r)[0]]
    for _ in range(500):
        res = pushers.crank_nicolson_push(dt, QM, r, p, fields)
        r, p = res.r, res.p
        rs.append(np.asarray(r)[0])
    rs = np.asarray(rs)
    drift_v = (rs[-1] - rs[0]) / (500 * dt)
    np.testing.assert_allclose(drift_v, [0.05, 0.0, 0.0], atol=5e-3)


# -- drift-kinetic ----------------------------------------------------


def test_drift_kinetic_uniform_B():
    """Uniform B, no E: guiding center moves along B at constant
    v_parallel; mu and p_perp invariant."""
    Bv = np.array([0.0, 0.0, 2.0])

    def fields(r0, rn):
        n = r0.shape[0]
        return (
            jnp.zeros((n, 3)),
            jnp.broadcast_to(jnp.asarray(Bv), (n, 3)),
            jnp.zeros((n, 3)),
        )

    dt = 0.05
    r = jnp.zeros((1, 3))
    ppar = jnp.asarray([0.3])
    pperp = jnp.asarray([0.2])
    mu = jnp.asarray([1.0 * 0.2**2 / (2 * 2.0)])
    for _ in range(50):
        res = pushers.drift_kinetic_push(dt, QM, 1.0, r, ppar, pperp, mu, fields)
        assert bool(res.converged.all())
        r, ppar, pperp = res.r, res.p_parallel, res.p_perp
    np.testing.assert_allclose(float(ppar[0]), 0.3, rtol=1e-12)
    np.testing.assert_allclose(float(pperp[0]), 0.2, rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(r)[0], [0.0, 0.0, 0.3 * 50 * dt], atol=1e-10
    )


def test_drift_kinetic_exb_drift():
    """Uniform crossed fields: guiding center drifts at E x B / B^2."""
    Ev = np.array([0.05, 0.0, 0.0])
    Bv = np.array([0.0, 0.0, 1.0])

    def fields(r0, rn):
        n = r0.shape[0]
        return (
            jnp.broadcast_to(jnp.asarray(Ev), (n, 3)),
            jnp.broadcast_to(jnp.asarray(Bv), (n, 3)),
            jnp.zeros((n, 3)),
        )

    dt = 0.1
    r = jnp.zeros((1, 3))
    ppar = jnp.asarray([0.0])
    pperp = jnp.asarray([0.1])
    mu = jnp.asarray([0.005])
    for _ in range(100):
        res = pushers.drift_kinetic_push(dt, QM, 1.0, r, ppar, pperp, mu, fields)
        r, ppar, pperp = res.r, res.p_parallel, res.p_perp
    # E x B / B^2 = (0.05 x_hat) x z_hat ... = -0.05 y_hat
    np.testing.assert_allclose(
        np.asarray(r)[0], [0.0, -0.05 * 100 * dt, 0.0], atol=1e-8
    )


# Single-process CI smoke subset: fast units that must pass under
# `pytest -n0 -m smoke` (no xdist worker containment).
import pytest as _smoke_pytest

pytestmark = _smoke_pytest.mark.smoke
