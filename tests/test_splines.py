"""Spline form-factor properties (reference values:
src/interfaces/sort_parameters.cpp:3-78)."""

import jax.numpy as jnp
import numpy as np
import pytest

from xpic_tpu.ops.splines import SPLINES, shape_radius


@pytest.mark.parametrize("order", range(6))
def test_partition_of_unity(order):
    """sum_g S(x - g) == 1 for every x — required for charge conservation."""
    sf = SPLINES[order]
    xs = np.linspace(0.0, 1.0, 41)
    if order == 0:
        # the closed support boundary |s| <= 0.5 double-counts exactly at
        # half-integers (so does the reference, sort_parameters.cpp:6-8)
        xs = xs[np.abs((xs + 0.5) % 1.0) > 1e-12]
    offsets = np.arange(-4, 5)
    total = np.array([float(jnp.sum(sf(x - offsets))) for x in xs])
    np.testing.assert_allclose(total, 1.0, atol=1e-14)


@pytest.mark.parametrize("order", range(6))
def test_support(order):
    sf = SPLINES[order]
    r = shape_radius(order)
    assert float(sf(r + 1e-9)) == 0.0
    assert float(sf(-(r + 1e-9))) == 0.0
    assert float(sf(0.0)) > 0.0


def test_reference_values():
    s0, s1, s2, s3 = SPLINES[0], SPLINES[1], SPLINES[2], SPLINES[3]
    assert float(s0(0.3)) == 1.0
    assert float(s1(0.25)) == 0.75
    np.testing.assert_allclose(float(s2(0.0)), 0.75)
    np.testing.assert_allclose(float(s2(1.0)), 0.125)
    np.testing.assert_allclose(float(s3(0.0)), 4.0 / 6.0)
    np.testing.assert_allclose(float(s3(1.0)), 1.0 / 6.0)


@pytest.mark.parametrize("order", range(1, 6))
def test_continuity(order):
    """B-splines of order >= 1 are continuous at the breakpoints."""
    sf = SPLINES[order]
    r = shape_radius(order)
    breaks = np.arange(-r, r + 0.25, 0.5)
    left = np.asarray(sf(jnp.asarray(breaks - 1e-9)))
    right = np.asarray(sf(jnp.asarray(breaks + 1e-9)))
    np.testing.assert_allclose(left, right, atol=1e-7)


# Single-process CI smoke subset: fast units that must pass under
# `pytest -n0 -m smoke` (no xdist worker containment).
import pytest as _smoke_pytest

pytestmark = _smoke_pytest.mark.smoke
