"""Fused single-jit ECSIM step over the persistent binned particle layout.

Composes the full semi-implicit timestep — drift, rebin, mass-matrix
assembly, GMRES field solve, Boris update, field advance — into one
jitted function over (fields, BinnedState), with optional sharding
constraints so GSPMD partitions it over a mesh.

The species stays in the padded ``[G, K]`` cell-binned layout across
steps (ops/binning.BinnedState): one keys-only sort plus one packed
gather per step is the whole migration cost, replacing the reference's
per-step ``update_cells`` list splicing (src/interfaces/particles.cpp:79-112).
Measured on v5e at 32^3 x 50 ppc this halves the step versus the
flat-primary pipeline (full payload sort + padded-view gather + inverse
binning).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import Geometry
from ..ops.binning import (
    BinnedState,
    bin_sorted,
    bin_state,
    drift_state,
    rebin,
    unbin_state,
)
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

# Pallas routing, resolved once at import (env vars are not part of the
# jit cache key, so reading them at trace time silently ignores flips
# after the first compile).  Default is the XLA einsum route: the A/B on
# a real v5e chip measured it *faster* than the fused Pallas fill at the
# bench shape (14.8M vs 13.2M particle-steps/s/chip), and pl.pallas_call
# has no SPMD partitioning rule so it must never be reached by
# mesh-sharded inputs.  ``XPIC_FORCE_PALLAS=1`` opts in (interpret mode
# is implied off-TPU so the same flag exercises the kernels in CI).
import os as _os

_FORCE_PALLAS = _os.environ.get("XPIC_FORCE_PALLAS") == "1"
# Mass-matrix strategy: "free" (default) never materializes matL — the
# apply re-walks the cell-binned particles per solver iteration
# (ops/mass_free.py; the assemble is a batched tiny-matmul that runs at
# 0.4 TF/s on v5e, benchmarks/profile_roofcal.py, and its L blocks cost
# 170 MB of HBM per write/read).  "blocks" restores the assembled
# route.  The f64 parity path always assembles (golden tables were
# validated against it and MatDump needs the blocks).
_MASS_MODE = _os.environ.get("XPIC_MASS", "free")


def _pallas_ok(dtype) -> bool:
    # Mosaic on the current TPU toolchain cannot legalize kernels traced
    # in 64-bit mode, so the fast route also requires x64 off.
    return (_FORCE_PALLAS and dtype == jnp.float32
            and not jax.config.jax_enable_x64)


def _mass_free_ok(dtype) -> bool:
    return (_MASS_MODE == "free" and dtype == jnp.float32
            and not _FORCE_PALLAS)


def _cell_spec(mesh):
    from jax.sharding import PartitionSpec as P

    axes = tuple(mesh.axis_names) if len(mesh.axis_names) > 1 else "z"
    return P, axes


def _shardmap_fill(mesh, *, q, m, mpw, dt, interpret):
    """Per-shard Pallas fill under a mesh: the fill is cell-local by
    construction (per-cell blocks + slot-summed currents), so shard_map
    over the cell axis is exact (VERDICT r2 item 7)."""
    from jax import shard_map

    from ..ops.pallas_ecsim import ecsim_fill_pallas

    P, axes = _cell_spec(mesh)
    fn = lambda t, p, B_p, valid: ecsim_fill_pallas(  # noqa: E731
        t, p, B_p, valid, q=q, m=m, mpw=mpw, dt=dt, interpret=interpret
    )
    return shard_map(
        fn, mesh=mesh,
        in_specs=(P(axes, None, None), P(axes, None, None),
                  P(axes, None, None), P(axes, None)),
        out_specs=(P(axes, None, None, None, None), P(axes, None, None)),
        check_vma=False,
    )


def _shardmap_gather(mesh, interpret):
    from jax import shard_map

    from ..ops.pallas_ecsim import ecsim_gather_pallas

    P, axes = _cell_spec(mesh)
    fn = lambda t, Fg: ecsim_gather_pallas(  # noqa: E731
        t, Fg, interpret=interpret
    )
    return shard_map(
        fn, mesh=mesh,
        in_specs=(P(axes, None, None), P(axes, None, None)),
        out_specs=P(axes, None, None),
        check_vma=False,
    )


def _pallas_interpret() -> bool:
    try:
        return jax.devices()[0].platform not in ("tpu", "axon")
    except Exception:  # pragma: no cover - no backend at all
        return True


def fill_phase(B, st: BinnedState, t, geom: Geometry, *, q, m, mpw,
               mesh=None):
    """currI deposit + the mass-matrix contribution + the slot weights/B
    at the particles (fill_ecsim_current, src/impls/ecsim/particles.cpp:33-173).

    Returns ``(currI, mass, W, B_p)``.  ``mass`` is the species' matL
    contribution in whichever representation the active strategy uses:
    the dense block array [G, 3, 12, 3, 12] (assembled routes), or a
    ``(MassOp, trace)`` pair for the matrix-free f32 speed path
    (ops/mass_free.py) — ``accumulate_mass`` folds either across
    species and ``advance_phase`` dispatches on the representation.
    """
    dt = geom.dt
    B_p = gather_vector(B, t, st.valid, geom, order=1, width=3, anchor=-1,
                        stagger=B_STAGGER)
    if _pallas_ok(B.dtype):
        from ..ops.ecsim_blocks import deposit_slot_sums
        from ..ops.pallas_ecsim import ecsim_fill_pallas

        if mesh is None:
            L, Islot = ecsim_fill_pallas(t, st.p, B_p, st.valid,
                                         q=q, m=m, mpw=mpw, dt=dt,
                                         interpret=_pallas_interpret())
        else:
            L, Islot = _shardmap_fill(
                mesh, q=q, m=m, mpw=mpw, dt=dt,
                interpret=_pallas_interpret(),
            )(t, st.p, B_p, st.valid)
        currI = deposit_slot_sums(Islot, geom)
        return currI, L, None, B_p
    if _mass_free_ok(B.dtype):
        from ..ops.mass_free import (
            deposit_vector_slots,
            implicit_current,
            mass_operands,
            mass_trace,
        )

        I_p = implicit_current(B_p, st.p, st.valid, q=q, m=m, mpw=mpw,
                               dt=dt)
        currI = deposit_vector_slots(I_p, t, geom)
        op = mass_operands(t, B_p, st.valid, q=q, m=m, mpw=mpw, dt=dt)
        return currI, (op, mass_trace(op)), None, B_p
    W = s1_slot_weights(t)
    I_p, M = ecsim_particle_terms(B_p, st.p, st.valid,
                                  q=q, m=m, mpw=mpw, dt=dt)
    currI = deposit_slots(I_p, W, geom)
    return currI, assemble_blocks(W, M), W, B_p


def accumulate_mass(acc, mass):
    """Fold one species' mass contribution into the running total:
    dense blocks add; matrix-free ``(MassOp, trace)`` pairs collect into
    ``((op, ...), trace_sum)``."""
    if isinstance(mass, tuple):
        op, tr = mass
        if acc is None:
            return ((op,), tr)
        ops, tr_acc = acc
        return (ops + (op,), tr_acc + tr)
    return mass if acc is None else acc + mass


def empty_mass(geom: Geometry, dtype):
    """The zero mass contribution in the active representation (used by
    the schemes when no species is loaded)."""
    if _mass_free_ok(dtype) and not _pallas_ok(dtype):
        return ((), jnp.zeros((), dtype))
    return jnp.zeros((geom.n_cells, 3, 12, 3, 12), dtype)


def advance_phase(E, B, B0, currI, mass, geom: Geometry, *, tol, maxit,
                  mesh=None, prev=None):
    """rhs = 2E - dt currI + dt curl-(B - B0); solve matA Ep = rhs
    (advance_fields, src/impls/ecsim/simulation.cpp:191-278).

    ``mass`` is the summed species contribution from
    ``fill_phase``/``accumulate_mass``: dense matL blocks, or the
    matrix-free ``((MassOp, ...), trace)`` form, in which case every
    solver iteration re-walks the particles instead of reading L."""
    dt = geom.dt
    steps, bounds = geom.cell_steps, geom.bounds
    half_dt2 = 0.5 * dt * dt

    if isinstance(mass, tuple):
        from ..ops.mass_free import MassOp, mass_apply

        ops, trace = mass
        if isinstance(ops, MassOp):  # raw single-species fill result
            ops = (ops,)

        def matL(x):
            return mass_apply(x, ops, geom) if ops else jnp.zeros_like(x)

        trace_total = trace
    else:
        def matL(x):
            return apply_blocks(mass, x, geom)

        trace_total = None

    def matA(x):
        y = 2.0 * x + half_dt2 * curl_negative(
            curl_positive(x, steps, bounds), steps, bounds
        )
        return y + matL(x)

    rhs = 2.0 * E - dt * currI + dt * curl_negative(B - B0, steps, bounds)
    from ..solvers.spectral import make_matM_preconditioner

    P = make_matM_preconditioner(geom, dt, dtype=E.dtype, mesh=mesh)
    M_inv = None
    if P is not None:
        if trace_total is None:
            trace_total = jnp.einsum("gcici->", mass)
        shift = trace_total / (3.0 * geom.n_cells)
        M_inv = lambda v: P(v, shift)  # noqa: E731
    # Initial guess rhs/2 = E - dt/2 J + dt/2 curl(B-B0): the explicit
    # first-order predictor of the half-step field (matA ~ 2I + O(dt^2)
    # + L).  Measured one full GMRES iteration cheaper per step than
    # x0=E at the bench shape (benchmarks/profile_gmres_x0.py: 4 vs 5
    # iters over 20 steps).  With ``prev = (Ep_prev, rhs_prev)`` from
    # the previous step, the delta predictor
    # x0 = Ep_prev + (rhs - rhs_prev)/2 warm-starts across steps:
    # matA(Ep_prev) ~ rhs_prev and matA^{-1} ~ I/2, so only the
    # step-to-step CHANGE of the system must be corrected — measured
    # one further iteration cheaper at the bench shape.  Passing
    # (0, 0) reproduces the cold predictor exactly.
    if prev is None:
        x0 = 0.5 * rhs
    else:
        Ep_p, rhs_p = prev
        x0 = Ep_p + 0.5 * (rhs - rhs_p)
    sol = gmres(matA, rhs, x0=x0, rtol=tol, atol=tol, maxit=maxit,
                M_inv=M_inv)
    return sol, rhs


def push_phase(Ep, st: BinnedState, t, W, B_p, geom: Geometry, *, qm,
               mesh=None):
    """Boris vEB with s1-interpolated fields at the already-moved
    positions (second_push, src/impls/ecsim/particles.cpp:175-196)."""
    if W is None and _pallas_ok(Ep.dtype):
        from ..ops.ecsim_blocks import gather_slots
        from ..ops.pallas_ecsim import ecsim_gather_pallas

        Fg = gather_slots(Ep, geom)
        if mesh is None:
            E_p = ecsim_gather_pallas(t, Fg, interpret=_pallas_interpret())
        else:
            E_p = _shardmap_gather(mesh, _pallas_interpret())(t, Fg)
    elif W is None:
        from ..ops.mass_free import gather_vector_slots

        E_p = gather_vector_slots(Ep, t, geom)
    else:
        E_p = gather_slot_fields(Ep, W, geom)
    E_p = jnp.where(st.valid[..., None], E_p, 0.0)
    p1 = update_vEB(geom.dt, qm, st.p, E_p, B_p)
    p1 = jnp.where(st.valid[..., None], p1, 0.0)
    return BinnedState(r=st.r, p=p1, valid=st.valid)


@partial(jax.jit, static_argnames=("geom", "q", "m", "mpw", "maxit",
                                   "mesh", "return_adv"))
def ecsim_step_binned(E, B, B0, st: BinnedState, geom: Geometry,
                      q: float, m: float, mpw: float, maxit: int = 100,
                      mesh=None, prev=None, return_adv: bool = False):
    """One full ECSIM timestep for a single species, fully fused, over
    the persistent binned layout.  ``mesh`` (static) routes the Pallas
    kernels through shard_map when the state is mesh-sharded.
    ``prev = (Ep_prev, rhs_prev)`` warm-starts the field solve (see
    ``advance_phase``); with ``return_adv`` the step also returns the
    ``(Ep, rhs)`` pair to feed the next step."""
    # f32 cannot reach the f64 parity tolerance of 1e-7 relative
    # (the reference's KSP budget, ecsim/simulation.h:15-18); the speed
    # path solves to the dtype's achievable floor instead.
    tol = 1e-5 if E.dtype == jnp.float32 else 1e-7

    st = rebin(drift_state(st, geom), geom, mesh)
    t = cell_t(geom, st.r)
    currI, mass, W, B_p = fill_phase(B, st, t, geom, q=q, m=m, mpw=mpw,
                                     mesh=mesh)
    sol, rhs = advance_phase(E, B, B0, currI, accumulate_mass(None, mass),
                             geom, tol=tol, maxit=maxit, mesh=mesh,
                             prev=prev)
    Ep = sol.x
    st = push_phase(Ep, st, t, W, B_p, geom, qm=q / m, mesh=mesh)

    E_new = 2.0 * Ep - E
    B_new = B - geom.dt * curl_positive(Ep, geom.cell_steps, geom.bounds)
    if return_adv:
        return E_new, B_new, st, currI, sol.iterations, (Ep, rhs)
    return E_new, B_new, st, currI, sol.iterations


@partial(jax.jit,
         static_argnames=("geom", "slots", "q", "m", "mpw", "maxit",
                          "mesh"))
def ecsim_step(E, B, B0, sp: ParticleArrays, geom: Geometry, slots: int,
               q: float, m: float, mpw: float, maxit: int = 100,
               mesh=None):
    """Flat-species wrapper around :func:`ecsim_step_binned` (kept for
    the multichip dryrun/tests API; converts at the boundary)."""
    st = bin_state(sp, geom, slots)
    E2, B2, st, currI, iters = ecsim_step_binned(
        E, B, B0, st, geom, q=q, m=m, mpw=mpw, maxit=maxit, mesh=mesh
    )
    return E2, B2, unbin_state(st, geom), currI, iters


@partial(jax.jit,
         static_argnames=("geom", "slots", "q", "m", "mpw", "maxit",
                          "n_steps", "mesh"))
def ecsim_multi_step(E, B, B0, sp: ParticleArrays, geom: Geometry,
                     slots: int, q: float, m: float, mpw: float,
                     maxit: int = 100, n_steps: int = 10, mesh=None):
    """``n_steps`` fused ECSIM timesteps under one jit (lax.scan).

    The production driver steps from the host for diagnostics cadence;
    this path measures/runs pure device throughput with no per-step
    dispatch or host fence (useful on backends with high dispatch
    latency, and the template for long diagnostic-free stretches).
    The species enters flat, runs binned across the scan (no per-step
    unbinning), and exits flat.  Returns the final state and the
    per-step KSP iteration counts.
    """
    st0 = bin_state(sp, geom, slots)

    # NOTE: a cross-step warm-start carry (prev=(Ep, rhs) threaded
    # through the scan) was measured NEUTRAL-to-negative here (r5:
    # 76.8M vs 78.8M, still 4 iterations): at the bench regime
    # w_pe dt = 1.5 the field rotates ~86 degrees per step, so the
    # previous solution predicts no better than the explicit 0.5*rhs.
    # The delta predictor stays available via ecsim_step_binned(prev=)
    # for small-dt regimes.
    def body(carry, _):
        E, B, st = carry
        E2, B2, st2, _, iters = ecsim_step_binned(
            E, B, B0, st, geom, q=q, m=m, mpw=mpw, maxit=maxit, mesh=mesh
        )
        return (E2, B2, st2), iters

    (E, B, st), iters = jax.lax.scan(body, (E, B, st0), None,
                                     length=n_steps)
    return E, B, unbin_state(st, geom), iters
