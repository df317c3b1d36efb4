"""Krylov and nonlinear solver unit tests."""

import jax.numpy as jnp
import numpy as np

from xpic_tpu.solvers import anderson_solve, cg, gmres


def spd_system(n=40, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((n, n))
    A = A @ A.T + n * np.eye(n)
    b = rng.standard_normal(n)
    return jnp.asarray(A), jnp.asarray(b)


def test_cg_spd():
    A, b = spd_system()
    res = cg(lambda x: A @ x, b, rtol=1e-10, atol=1e-12, maxit=200)
    assert bool(res.converged)
    x_ref = np.linalg.solve(np.asarray(A), np.asarray(b))
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-7)


def test_gmres_nonsymmetric():
    rng = np.random.default_rng(1)
    n = 40
    A = np.eye(n) * 4 + 0.5 * rng.standard_normal((n, n))
    b = rng.standard_normal(n)
    Aj, bj = jnp.asarray(A), jnp.asarray(b)
    res = gmres(lambda x: Aj @ x, bj, rtol=1e-9, atol=1e-12, maxit=200,
                restart=20)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), np.linalg.solve(A, b),
                               rtol=1e-6)


def test_gmres_multidim_operand():
    """Operands keep their [3, nz, ny, nx] field shape through the solver."""
    rng = np.random.default_rng(2)
    shape = (3, 4, 4, 4)
    diag = jnp.asarray(3.0 + rng.random(shape))
    b = jnp.asarray(rng.standard_normal(shape))
    res = gmres(lambda x: diag * x, b, rtol=1e-10, atol=1e-13, maxit=50)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(b / diag),
                               rtol=1e-8)


def test_cg_respects_initial_guess():
    A, b = spd_system(seed=3)
    x_ref = np.linalg.solve(np.asarray(A), np.asarray(b))
    res = cg(lambda x: A @ x, b, x0=jnp.asarray(x_ref), rtol=1e-10,
             atol=1e-12, maxit=5)
    assert bool(res.converged)
    assert int(res.iterations) <= 1


def test_anderson_nonlinear():
    """Solve the nonlinear system x + 0.1 tanh(x) - c = 0."""
    rng = np.random.default_rng(4)
    c = jnp.asarray(rng.standard_normal(30))

    def residual(x):
        return x + 0.1 * jnp.tanh(x) - c

    res = anderson_solve(residual, jnp.zeros(30), atol=1e-10, rtol=1e-10,
                         stol=1e-14, maxit=100)
    assert res.converged
    np.testing.assert_allclose(np.asarray(residual(res.x)), 0.0, atol=1e-9)


def test_cheb_pallas_matches_xla(monkeypatch):
    """The fused in-VMEM Chebyshev kernel (ops/pallas_stencil) must
    reproduce the XLA recurrence of make_matM_preconditioner exactly
    (same arithmetic, interpret mode off-TPU) for periodic and
    zero-ghost bounds and a traced shift."""
    import jax

    from xpic_tpu.config import Geometry
    from xpic_tpu.ops.pallas_stencil import (
        cheb_matM_inv_pallas,
        cheb_pallas_ok,
    )
    from xpic_tpu.solvers import spectral

    rng = np.random.default_rng(11)
    for bounds in [("periodic",) * 3,
                   ("ghosted", "periodic", "reflective")]:
        geom = Geometry(dx=0.5, dy=0.4, dz=0.6, dt=1.5,
                        nx=16, ny=8, nz=8, nt=1, bounds=bounds)
        assert cheb_pallas_ok(geom, jnp.float32)
        rhs = jnp.asarray(
            rng.standard_normal((3, geom.nz, geom.ny, geom.nx)),
            jnp.float32)
        # Reference: force the XLA form regardless of the host device
        # count (the suite fixture forces 8 CPU devices).
        monkeypatch.setattr(spectral, "_cheb_pallas_usable",
                            lambda *a: False)
        P = spectral.make_matM_preconditioner(geom, geom.dt,
                                              dtype=jnp.float32)
        ref = np.asarray(P(rhs, 0.37))
        got = np.asarray(jax.jit(
            lambda r, s: cheb_matM_inv_pallas(
                r, s, geom=geom, degree=12, dt=geom.dt, interpret=True)
        )(rhs, jnp.float32(0.37)))
        np.testing.assert_allclose(got, ref,
                                   rtol=2e-6, atol=2e-6 * np.abs(ref).max())


# Single-process CI smoke subset: fast units that must pass under
# `pytest -n0 -m smoke` (no xdist worker containment).
import pytest as _smoke_pytest

pytestmark = _smoke_pytest.mark.smoke
