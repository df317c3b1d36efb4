"""Yee stencil operator identities (reference: src/utils/operators.cpp)."""

import jax.numpy as jnp
import numpy as np

from xpic_tpu.ops.stencil import (
    curl_negative,
    curl_positive,
    divergence_negative,
    divergence_positive,
    gradient_positive,
)

STEPS = (0.5, 0.7, 0.9)
SHAPE = (3, 6, 5, 4)  # [3, nz, ny, nx]


def rand_field(seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal(SHAPE))


def test_div_of_curl_is_zero():
    F = rand_field()
    c = curl_positive(F, STEPS)
    d = divergence_positive(c, STEPS)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-12)
    c = curl_negative(F, STEPS)
    d = divergence_negative(c, STEPS)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-12)


def test_curl_adjointness():
    """<curl+ a, b> == <a, curl- b> on the periodic lattice — this is the
    discrete integration-by-parts that makes ECSIM's rotB.rotE symmetric
    (used as matM, src/impls/ecsim/simulation.cpp:544-551)."""
    a, b = rand_field(1), rand_field(2)
    lhs = float(jnp.sum(curl_positive(a, STEPS) * b))
    rhs = float(jnp.sum(a * curl_negative(b, STEPS)))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-12)


def test_curl_of_uniform_is_zero():
    F = jnp.ones(SHAPE)
    np.testing.assert_allclose(np.asarray(curl_positive(F, STEPS)), 0.0)
    np.testing.assert_allclose(np.asarray(curl_negative(F, STEPS)), 0.0)


def test_curl_plane_wave_eigenvalue():
    """curl of a z-propagating transverse sine wave matches the discrete
    wavenumber 2 sin(k dz / 2) / dz up to Yee phase shifts."""
    nz, dz = SHAPE[1], STEPS[2]
    k = 2 * np.pi / (nz * dz)
    z_idx = np.arange(nz)
    F = np.zeros(SHAPE)
    F[0, :, :, :] = np.sin(k * z_idx * dz)[:, None, None]  # F_x(z)
    c = np.asarray(curl_positive(jnp.asarray(F), STEPS))
    # (curl F)_y = dF_x/dz (forward difference)
    expected = (np.sin(k * (z_idx + 1) * dz) - np.sin(k * z_idx * dz)) / dz
    np.testing.assert_allclose(
        c[1, :, 0, 0], expected, atol=1e-12
    )
    np.testing.assert_allclose(c[0], 0.0, atol=1e-12)
    np.testing.assert_allclose(c[2], 0.0, atol=1e-12)


def test_grad_div_adjointness():
    rng = np.random.default_rng(3)
    f = jnp.asarray(rng.standard_normal(SHAPE[1:]))
    F = rand_field(4)
    lhs = float(jnp.sum(gradient_positive(f, STEPS) * F))
    rhs = -float(jnp.sum(f * divergence_negative(F, STEPS)))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-12)


# Single-process CI smoke subset: fast units that must pass under
# `pytest -n0 -m smoke` (no xdist worker containment).
import pytest as _smoke_pytest

pytestmark = _smoke_pytest.mark.smoke
