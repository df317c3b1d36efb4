"""Fused single-jit ECSIM step for compile checks and multi-chip dryruns.

Composes the full semi-implicit timestep — drift, bin, mass-matrix
assembly, GMRES field solve, Boris update, field advance — into one
jitted function over (fields, particles), with optional sharding
constraints so GSPMD partitions it over a mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import Geometry
from ..ops.binning import bin_sorted
from ..ops.ecsim_blocks import (
    apply_blocks,
    assemble_blocks,
    deposit_slots,
    ecsim_particle_terms,
    gather_slot_fields,
    s1_slot_weights,
)
from ..ops.gather_scatter import B_STAGGER, cell_t, gather_vector
from ..ops.stencil import curl_negative, curl_positive
from ..particles import ParticleArrays, apply_boundaries, sort_by_cell
from ..pushers import update_vEB
from ..solvers import gmres


def _pallas_ok(dtype) -> bool:
    """Route the f32 speed path through the fused Pallas kernels on TPU.

    Resolved at trace time (the backend cannot change within a process);
    ``XPIC_FORCE_PALLAS=1`` / ``XPIC_NO_PALLAS=1`` override for testing.
    """
    import os

    if os.environ.get("XPIC_NO_PALLAS") == "1":
        return False
    if dtype != jnp.float32:
        return False
    if os.environ.get("XPIC_FORCE_PALLAS") == "1":
        return True
    try:
        plat = jax.devices()[0].platform
    except Exception:
        return False
    return plat in ("tpu", "axon")


@partial(jax.jit,
         static_argnames=("geom", "slots", "q", "m", "mpw", "maxit"))
def ecsim_step(E, B, B0, sp: ParticleArrays, geom: Geometry, slots: int,
               q: float, m: float, mpw: float, maxit: int = 100):
    """One full ECSIM timestep for a single species, fully fused."""
    dt = geom.dt
    steps, bounds = geom.cell_steps, geom.bounds
    # f32 cannot reach the f64 parity tolerance of 1e-7 relative
    # (the reference's KSP budget, ecsim/simulation.h:15-18); the speed
    # path solves to the dtype's achievable floor instead.
    if E.dtype == jnp.float32:
        tol = 1e-5
    else:
        tol = 1e-7
    use_pallas = _pallas_ok(E.dtype)

    # first_push + rebin
    sp = apply_boundaries(
        ParticleArrays(r=sp.r + sp.p * dt, p=sp.p, alive=sp.alive), geom
    )
    ids = None
    sp = _sort(sp, geom)
    binned = bin_sorted(sp, geom, slots)
    t = cell_t(geom, binned.r)

    # fill currI + matL
    B_p = gather_vector(B, t, binned.valid, geom, order=1, width=3, anchor=-1,
                        stagger=B_STAGGER)
    if use_pallas:
        from ..ops.ecsim_blocks import deposit_slot_sums
        from ..ops.pallas_ecsim import ecsim_fill_pallas

        L, Islot = ecsim_fill_pallas(t, binned.p, B_p, binned.valid,
                                     q=q, m=m, mpw=mpw, dt=dt)
        currI = deposit_slot_sums(Islot, geom)
        W = None
    else:
        W = s1_slot_weights(t)
        I_p, M = ecsim_particle_terms(B_p, binned.p, binned.valid,
                                      q=q, m=m, mpw=mpw, dt=dt)
        currI = deposit_slots(I_p, W, geom)
        L = assemble_blocks(W, M)

    # advance_fields
    half_dt2 = 0.5 * dt * dt

    def matA(x):
        y = 2.0 * x + half_dt2 * curl_negative(
            curl_positive(x, steps, bounds), steps, bounds
        )
        return y + apply_blocks(L, x, geom)

    rhs = 2.0 * E - dt * currI + dt * curl_negative(B - B0, steps, bounds)
    from ..solvers.spectral import make_matM_preconditioner

    P = make_matM_preconditioner(geom, dt, dtype=E.dtype)
    M_inv = None
    if P is not None:
        shift = jnp.einsum("gcici->", L) / (3.0 * geom.n_cells)
        M_inv = lambda v: P(v, shift)  # noqa: E731
    sol = gmres(matA, rhs, x0=E, rtol=tol, atol=tol, maxit=maxit, M_inv=M_inv)
    Ep = sol.x

    # second_push
    if use_pallas:
        from ..ops.ecsim_blocks import gather_slots
        from ..ops.pallas_ecsim import ecsim_gather_pallas

        E_p = ecsim_gather_pallas(t, gather_slots(Ep, geom))
    else:
        E_p = gather_slot_fields(Ep, W, geom)
    E_p = jnp.where(binned.valid[..., None], E_p, 0.0)
    p1 = update_vEB(dt, q / m, binned.p, E_p, B_p)
    p1 = jnp.where(binned.valid[..., None], p1, 0.0)
    from ..ops.binning import scatter_back

    from ..particles import cell_ids
    p_new = scatter_back(binned, p1, sp.r.shape[0], ids=cell_ids(sp, geom))
    sp = ParticleArrays(r=sp.r, p=p_new, alive=sp.alive)

    # final_update
    E_new = 2.0 * Ep - E
    B_new = B - dt * curl_positive(Ep, steps, bounds)
    return E_new, B_new, sp, currI, sol.iterations


def _sort(sp: ParticleArrays, geom: Geometry) -> ParticleArrays:
    from ..particles import sort_by_cell_impl

    return sort_by_cell_impl(sp, geom)


@partial(jax.jit,
         static_argnames=("geom", "slots", "q", "m", "mpw", "maxit",
                          "n_steps"))
def ecsim_multi_step(E, B, B0, sp: ParticleArrays, geom: Geometry,
                     slots: int, q: float, m: float, mpw: float,
                     maxit: int = 100, n_steps: int = 10):
    """``n_steps`` fused ECSIM timesteps under one jit (lax.scan).

    The production driver steps from the host for diagnostics cadence;
    this path measures/runs pure device throughput with no per-step
    dispatch or host fence (useful on backends with high dispatch
    latency, and the template for long diagnostic-free stretches).
    Returns the final state and the per-step KSP iteration counts.
    """

    def body(carry, _):
        E, B, sp = carry
        E2, B2, sp2, _, iters = ecsim_step(
            E, B, B0, sp, geom, slots, q=q, m=m, mpw=mpw, maxit=maxit
        )
        return (E2, B2, sp2), iters

    (E, B, sp), iters = jax.lax.scan(body, (E, B, sp), None, length=n_steps)
    return E, B, sp, iters
