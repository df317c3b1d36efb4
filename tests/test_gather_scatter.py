"""Gather/deposit kernel properties.

These validate the cell-anchored window kernels against the invariants
the reference machinery guarantees: interpolation of a constant field is
exact (partition of unity over the Yee windows), deposits are adjoint to
gathers, and the Esirkepov deposit satisfies the discrete continuity
equation (the whole point of esirkepov_decomposition.cpp).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from xpic_tpu.config import Geometry
from xpic_tpu.ops.binning import bin_sorted, choose_slots, max_per_cell
from xpic_tpu.ops.gather_scatter import (
    B_STAGGER,
    E_STAGGER,
    cell_t,
    deposit_scalar,
    deposit_vector,
    esirkepov_current,
    gather_vector,
)
from xpic_tpu.ops.stencil import divergence_negative
from xpic_tpu.particles import ParticleArrays, sort_by_cell

GEOM = Geometry(dx=0.5, dy=0.5, dz=0.5, dt=0.1, nx=6, ny=5, nz=4, nt=1)


def make_species(n=200, seed=0):
    rng = np.random.default_rng(seed)
    r = rng.random((n, 3)) * np.array(GEOM.L)
    p = rng.standard_normal((n, 3)) * 0.05
    sp = ParticleArrays(
        r=jnp.asarray(r), p=jnp.asarray(p), alive=jnp.ones(n, bool)
    )
    sp = sort_by_cell(sp, GEOM)
    slots = choose_slots(max_per_cell(sp, GEOM))
    return sp, bin_sorted(sp, GEOM, slots)


@pytest.mark.parametrize("order,width,anchor", [(1, 3, -1), (2, 4, -1), (2, 6, -2)])
@pytest.mark.parametrize("stagger", [E_STAGGER, B_STAGGER])
def test_constant_field_gather(order, width, anchor, stagger):
    _, binned = make_species()
    F = jnp.ones((3,) + GEOM.shape) * jnp.asarray([2.0, -3.0, 5.0])[:, None, None, None]
    t = cell_t(GEOM, binned.r)
    got = gather_vector(F, t, binned.valid, GEOM, order=order, width=width,
                        anchor=anchor, stagger=stagger)
    expect = jnp.where(
        binned.valid[..., None], jnp.asarray([2.0, -3.0, 5.0]), 0.0
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=1e-13)


def test_linear_field_gather_is_exact_order2():
    """Order >= 1 splines reproduce linear fields exactly at the Yee points."""
    _, binned = make_species()
    # F_c linear in its own staggered coordinate
    zi, yi, xi = np.meshgrid(
        np.arange(GEOM.nz), np.arange(GEOM.ny), np.arange(GEOM.nx), indexing="ij"
    )
    F = np.zeros((3,) + GEOM.shape)
    F[0] = (xi + 0.5) * GEOM.dx  # E_x at x+1/2
    t = cell_t(GEOM, binned.r)
    got = gather_vector(jnp.asarray(F), t, binned.valid, GEOM, order=2,
                        width=4, anchor=-1, stagger=E_STAGGER)
    d = jnp.asarray(GEOM.cell_steps)
    # interior particles only (periodic wrap breaks linearity at edges)
    r = np.asarray(binned.r * d)
    interior = (
        (r[..., 0] > 1.5 * GEOM.dx) & (r[..., 0] < GEOM.Lx - 1.5 * GEOM.dx)
        & np.asarray(binned.valid)
    )
    np.testing.assert_allclose(
        np.asarray(got[..., 0])[interior], r[..., 0][interior], rtol=1e-12
    )


@pytest.mark.parametrize("order,width,anchor", [(1, 3, -1), (2, 4, -1)])
def test_gather_deposit_adjoint(order, width, anchor):
    """<gather(F), v>_particles == <F, deposit(v)>_grid."""
    _, binned = make_species()
    rng = np.random.default_rng(42)
    F = jnp.asarray(rng.standard_normal((3,) + GEOM.shape))
    v = jnp.asarray(rng.standard_normal(binned.r.shape))
    t = cell_t(GEOM, binned.r)
    g = gather_vector(F, t, binned.valid, GEOM, order=order, width=width,
                      anchor=anchor, stagger=E_STAGGER)
    dep = deposit_vector(v, t, binned.valid, GEOM, order=order, width=width,
                         anchor=anchor, stagger=E_STAGGER)
    lhs = float(jnp.sum(g * jnp.where(binned.valid[..., None], v, 0.0)))
    rhs = float(jnp.sum(F * dep))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-12)


def test_scalar_deposit_total_charge():
    """Total deposited density equals the number of (weighted) particles."""
    _, binned = make_species()
    t = cell_t(GEOM, binned.r)
    vals = jnp.ones(binned.valid.shape)
    rho = deposit_scalar(vals, t, binned.valid, GEOM, order=2, width=4, anchor=-1)
    np.testing.assert_allclose(
        float(jnp.sum(rho)), float(jnp.sum(binned.valid)), rtol=1e-12
    )


def test_esirkepov_continuity():
    """div_minus(J) == -(rho_new - rho_old)/dt for the Esirkepov deposit —
    the defining property of the scheme (esirkepov_decomposition.cpp)."""
    sp, binned = make_species(n=300, seed=7)
    dt = GEOM.dt
    d = jnp.asarray(GEOM.cell_steps)
    rng = np.random.default_rng(3)
    # displacement below one cell, as required by the method
    dr = jnp.asarray(rng.uniform(-0.4, 0.4, binned.r.shape))
    rg0 = binned.r
    rg1 = binned.r + dr

    t0 = cell_t(GEOM, rg0)
    t1 = cell_t(GEOM, rg1)
    q_nNp = -1.0  # electron charge times unit weight
    J = esirkepov_current(t0, t1, binned.valid, q_nNp / (6.0 * dt), GEOM)

    ones = jnp.ones(binned.valid.shape)
    rho0 = q_nNp * deposit_scalar(ones, t0, binned.valid, GEOM, order=2,
                                  width=6, anchor=-2)
    rho1 = q_nNp * deposit_scalar(ones, t1, binned.valid, GEOM, order=2,
                                  width=6, anchor=-2)

    divJ = divergence_negative(J, GEOM.cell_steps, GEOM.bounds)
    resid = np.asarray((rho1 - rho0) / dt + divJ)
    np.testing.assert_allclose(resid, 0.0, atol=1e-12)


def test_esirkepov_zero_for_static_particles():
    _, binned = make_species()
    t0 = cell_t(GEOM, binned.r)
    J = esirkepov_current(t0, t0, binned.valid, 1.0, GEOM)
    np.testing.assert_allclose(np.asarray(J), 0.0, atol=1e-15)


# Single-process CI smoke subset: fast units that must pass under
# `pytest -n0 -m smoke` (no xdist worker containment).
import pytest as _smoke_pytest

pytestmark = _smoke_pytest.mark.smoke
