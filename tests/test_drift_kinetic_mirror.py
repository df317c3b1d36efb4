"""Drift-kinetic push in analytic magnetic mirrors.

Mirrors the reference's drift_kinetic_push test suite
(tests/drift_kinetic_push/drift_kinetic_push.h:24-130): guiding-center
particles in quadratic and double-gaussian mirror fields supplied as
analytic callbacks (no grid).  Checks the defining invariants:

* longitudinal energy ppar^2/2m + mu B(z) is conserved;
* p_perp tracks sqrt(2 m mu B) (magnetic-moment conservation);
* the particle is trapped: it turns where mu B(z_t) matches the total
  energy and never passes the analytic turning point.
"""

import jax.numpy as jnp
import numpy as np

from xpic_tpu import pushers

QM = -1.0  # electron q/m
MP = 1.0

# -- quadratic mirror (drift_kinetic_push.h:24-70) ---------------------------
B_MIN, B_MAX = 1.0, 4.0
D = 40.0  # mirror length scale


def quad_Bz(z):
    return B_MIN + (B_MAX - B_MIN) * (z / D) ** 2


def quad_dBz(z):
    return 2.0 * (B_MAX - B_MIN) * z / D**2


def quad_fields(r0, rn):
    """On-axis quadratic mirror (r = 0): B = Bz(z) z_hat."""
    n = rn.shape[0]
    z = rn[:, 2]
    B = jnp.stack([jnp.zeros(n), jnp.zeros(n), quad_Bz(z)], axis=-1)
    gradB = jnp.stack([jnp.zeros(n), jnp.zeros(n), quad_dBz(z)], axis=-1)
    return jnp.zeros((n, 3)), B, gradB


def run_mirror(fields, Bz_fn, z0, ppar0, pperp0, dt, steps):
    """Whole trajectory under one jit (lax.scan over steps)."""
    import jax
    from functools import partial

    r = jnp.asarray([[0.0, 0.0, z0]])
    ppar = jnp.asarray([ppar0])
    pperp = jnp.asarray([pperp0])
    B0 = float(Bz_fn(z0))
    mu = jnp.asarray([MP * pperp0**2 / (2.0 * B0)])

    @partial(jax.jit, static_argnames=("steps",))
    def run(r, ppar, pperp, mu, steps):
        def body(carry, _):
            r, ppar, pperp, all_conv = carry
            res = pushers.drift_kinetic_push(
                dt, QM, MP, r, ppar, pperp, mu, fields
            )
            carry = (res.r, res.p_parallel, res.p_perp,
                     all_conv & res.converged.all())
            return carry, (res.r[0, 2], res.p_parallel[0], res.p_perp[0])
        (_, _, _, conv), traj = jax.lax.scan(
            body, (r, ppar, pperp, jnp.asarray(True)), None, length=steps
        )
        return conv, traj

    conv, (zs, ppars, pperps) = run(r, ppar, pperp, mu, steps)
    assert bool(conv), "drift-kinetic Picard iteration diverged"
    zs = np.concatenate([[z0], np.asarray(zs)])
    ppars = np.concatenate([[ppar0], np.asarray(ppars)])
    pperps = np.concatenate([[pperp0], np.asarray(pperps)])
    return zs, ppars, pperps, float(mu[0])


def test_quadratic_mirror_trapping_and_mu():
    z0, ppar0, pperp0 = 0.0, 0.1, 0.2
    dt = 0.5
    # Bounce frequency ~ sqrt(2 mu (B_MAX-B_MIN)/D^2) -> period ~ 725;
    # run two bounce periods.
    zs, ppars, pperps, mu = run_mirror(
        quad_fields, quad_Bz, z0, ppar0, pperp0, dt, steps=3000
    )

    # Longitudinal energy conservation: ppar^2/2 + mu B(z) = const.
    E = 0.5 * ppars**2 + mu * quad_Bz(zs)
    np.testing.assert_allclose(E, E[0], rtol=1e-8)

    # mu conservation through p_perp ~ sqrt(B)
    # (drift_kinetic_push.cpp: |p_perp| = sqrt(2 m mu B)).
    np.testing.assert_allclose(
        pperps, np.sqrt(2.0 * MP * mu * quad_Bz(zs)), rtol=1e-10
    )

    # Analytic turning point: mu B(z_t) = E  ->  (z_t/D)^2 = ppar0^2 /
    # (2 mu (B_MAX - B_MIN)).
    z_turn = D * np.sqrt(ppar0**2 / (2.0 * mu * (B_MAX - B_MIN)))
    assert np.max(np.abs(zs)) < z_turn * 1.02
    assert np.max(np.abs(zs)) > z_turn * 0.95  # it really reaches the wall

    # It bounces: parallel velocity changes sign at least twice.
    assert np.sum(np.abs(np.diff(np.sign(ppars)))) >= 4


# -- double-gaussian mirror (drift_kinetic_push.h:74-130) ---------------------
GL = 5.0  # half-length of the trap
GS = 1.0  # mirror width squared


def gauss_Bz(z):
    return B_MIN + (B_MAX - B_MIN) * (
        np.exp(-((z + GL) ** 2) / GS) + np.exp(-((z - GL) ** 2) / GS)
    )


def gauss_fields(r0, rn):
    n = rn.shape[0]
    z = rn[:, 2]
    e1 = jnp.exp(-((z + GL) ** 2) / GS)
    e2 = jnp.exp(-((z - GL) ** 2) / GS)
    Bz = B_MIN + (B_MAX - B_MIN) * (e1 + e2)
    dBz = (B_MAX - B_MIN) * (
        -2.0 * (z + GL) / GS * e1 - 2.0 * (z - GL) / GS * e2
    )
    zero = jnp.zeros(n)
    return (
        jnp.zeros((n, 3)),
        jnp.stack([zero, zero, Bz], axis=-1),
        jnp.stack([zero, zero, dBz], axis=-1),
    )


def test_gaussian_mirror_trapping_and_mu():
    z0, ppar0, pperp0 = 0.0, 0.15, 0.2
    dt = 0.2
    zs, ppars, pperps, mu = run_mirror(
        gauss_fields, gauss_Bz, z0, ppar0, pperp0, dt, steps=2500
    )

    E = 0.5 * ppars**2 + mu * gauss_Bz(zs)
    np.testing.assert_allclose(E, E[0], rtol=1e-7)
    np.testing.assert_allclose(
        pperps, np.sqrt(2.0 * MP * mu * gauss_Bz(zs)), rtol=1e-10
    )
    # Trapped well inside the gaussian bumps at +-GL.
    assert np.max(np.abs(zs)) < GL
    assert np.sum(np.abs(np.diff(np.sign(ppars)))) >= 4
