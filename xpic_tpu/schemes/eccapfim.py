"""eccapfim: fully implicit, energy- and charge-conserving scheme.

Reference: src/impls/eccapfim/{simulation,particles}.cpp.  Each step
solves the nonlinear Maxwell system over E^{n+1/2} (the SNES NGMRES
solve, eccapfim/simulation.cpp:69-104) where every residual evaluation
re-integrates all particles from their start-of-step state with a
Crank-Nicolson Picard iteration and deposits the path-averaged current
(form_iteration, eccapfim/particles.cpp:30-180):

    F(E_h) = E_h + dt^2/4 curl-(curl+(E_h)) - E^n
             + dt/2 J(E_h) - dt/2 curl-(B^n)

After convergence: E^{n+1} = 2 sol - E^n, B^{n+1} = B^n - dt curl+(sol).

TPU redesign of the particle sweep:
* particles binned once per step by their start-of-step cell
  (``previous_storage`` analog, eccapfim/particles.h:28-30);
* fields pre-gathered into per-cell 6^3 window blocks once per residual
  evaluation; the Picard loop contracts weights against blocks
  (no grid access inside the loop);
* the reference's per-particle cell-traversal while loop
  (cell_traversal.cpp) becomes a fixed 4-segment path split —
  exact while per-axis displacement stays below one cell, which the
  reference's own CFL guard assumes (simulation.tpp:68-77);
* domain-boundary sub-stepping disappears: positions stay unwrapped
  during the step (windows wrap via periodic rolls) and wrap once at
  the end.

Nonlinear solver: Anderson mixing (the algorithmic core of NGMRES) with
atol=rtol=1e-7, maxit as configured (eccapfim/simulation.h:14-24).
"""

from __future__ import annotations

import logging
import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Geometry
from ..ops.binning import BinnedState, migrate_checked
from ..ops.gather_scatter import cell_t
from ..ops.implicit_esirkepov import (
    MAXSEG,
    deposit_J_implicit,
    gather_B_implicit,
    gather_E_implicit,
    gather_window_blocks,
    scatter_blocks,
    split_segments,
)
from ..ops.stencil import curl_negative, curl_positive
from ..solvers import anderson_solve
from ..solvers.anderson import anderson_solve_device
from .base import Simulation

log = logging.getLogger("xpic")

# Outer-solve pacing, resolved at import per the repo's jit-cache rule:
#   host (default)    host-paced outer loop: one fused-residual
#                     dispatch per iteration, one 3-scalar fetch.
#   device            the whole Anderson loop as ONE lax.while_loop
#                     dispatch with a single fused fetch per step.
#                     MEASURED NEGATIVE on the v5e/axon backend (r5):
#                     1.93 s/step host vs 11.7 s/step device at
#                     identical iteration counts — wrapping the large
#                     fused residual in an outer while_loop defeats
#                     XLA:TPU's scheduling of the body (same programs,
#                     6x the runtime).  The host loop's round-trips
#                     cost ~2.5% of the step, so the device form only
#                     matters for much cheaper residuals; kept opt-in.
_ANDERSON_MODE = os.environ.get("XPIC_ANDERSON", "host")

# Crosser-compaction fast path (r5): at production dt only a few % of
# particles cross a node-cell face during a step, yet the general path
# pays the full 4-segment gather/deposit for every particle.  The fast
# path classifies probable crossers with a conservative displacement
# bound, partitions each cell row so they occupy the first ``kc`` slot
# columns (a stable in-row argsort — no cross-cell data movement, no
# scatter), runs the exact 4-segment path on the [G, kc] slice only,
# and the collapsed single-segment kernel on the [G, K-kc] rest.  An
# exact per-iteration post-check counts any misclassified particle
# (a "non-crosser" whose Picard iterate crossed a face) and the per-row
# crosser-count overflow; either flags the step and the host re-runs
# the solve on the general path, so the result is never approximate
# (same contract as the rebin guard, ops/neighbor_rebin.py).
#   XPIC_FIM_FAST=0 disables; XPIC_FIM_KC overrides the crosser width.
_FIM_FAST = os.environ.get("XPIC_FIM_FAST", "1") != "0"
_FIM_KC = int(os.environ.get("XPIC_FIM_KC", "0"))


def _pick_kc(K: int) -> int:
    """Crosser-slot width: ~K/3 bounds the per-cell crosser count with
    a Poisson-tail margin at the measured few-% crossing rate; rows
    narrower than 12 slots gain nothing over the general path."""
    if _FIM_KC:
        return min(K, _FIM_KC)
    if K < 12:
        return 0
    return max(8, K // 3)

ATOL = 1e-7
RTOL = 1e-7
MAXIT = 1000
CN_MAXIT = 30
CN_TOL = 0.5 * ATOL
# The f32 speed path cannot reach the reference's f64 budgets; it
# solves to the dtype's achievable floor instead (same policy as the
# ecsim KSP tolerance, schemes/ecsim.py).  The outer criterion is RMS
# per dof (the L2 norm grows with sqrt(n), and the f32 deposit/sweep
# roundoff floor grows with it — measured: the 32^3 bench stalls at
# |G| ~ 1.5e-5 while a 6^3 box reaches 1e-6).
ATOL_F32 = 1e-5  # per sqrt(dof)
# Per-particle Picard floor: at the bench shape a ~1e-5 tail of
# particles sits near field nodes where the f32 gather jitter stalls
# the iteration around 1e-5; 2e-5 clears it with margin.
CN_TOL_F32 = 2e-5


def _pallas_fields_ok(dtype) -> bool:
    """Opt-in routing of the segment-field gather through the fused
    Pallas kernel (ops/pallas_implicit).  MEASURED NEGATIVE on this
    Mosaic toolchain (r5): the ~2.6K-op segment body spills essentially
    every SSA value to the kernel's VMEM stack (120 MB scoped at
    bg=64; the bg=8 variant that fits runs at 0.28M particle-steps/s
    vs the einsum route's 0.85M).  The kernel remains the record of
    the experiment and is exact f32 (the einsum route needs
    precision="highest" to avoid TPU bf16 multiplies);
    ``XPIC_FIM_PALLAS=1`` opts in."""
    if os.environ.get("XPIC_FIM_PALLAS", "0") != "1":
        return False
    if dtype != jnp.float32 or jax.config.jax_enable_x64:
        return False
    try:
        return len(jax.devices()) == 1
    except Exception:  # pragma: no cover
        return False


def _segment_fields(Eblk, Bblk, t0, tn):
    """Path-averaged (E, B) over the cell-crossing segments
    (eccapfim/particles.cpp:104-124): sum over segments of
    length-fraction-weighted implicit-Esirkepov gathers."""
    if _pallas_fields_ok(t0.dtype):
        from ..ops.binning import _pallas_interpret
        from ..ops.pallas_implicit import segment_fields_pallas

        return segment_fields_pallas(Eblk, Bblk, t0, tn,
                                     interpret=_pallas_interpret())
    taus = split_segments(t0, tn)  # [G, K, MAXSEG+1]
    d = tn - t0
    E_p = 0.0
    B_p = 0.0
    for s in range(MAXSEG):
        a = taus[..., s][..., None]
        b = taus[..., s + 1][..., None]
        seg0 = t0 + a * d
        seg1 = t0 + b * d
        bs = (b - a)  # = ds/|d| for a straight path
        E_p = E_p + bs * gather_E_implicit(Eblk, seg0, seg1)
        B_p = B_p + bs * gather_B_implicit(Bblk, 0.5 * (seg0 + seg1))
    return E_p, B_p


def _rest_fields(Eblk, Bblk, t0):
    """Zero-displacement specialization of :func:`_segment_fields`:
    at tn == t0 there is exactly one segment and the two E terms of
    the implicit-Esirkepov kernel coincide (sn == s0, so the
    combination weights are both 3 S2), collapsing the gather to three
    contractions — ~1/6 the cost of the general 4-segment path.
    Exactly equal to ``_segment_fields(Eblk, Bblk, t0, t0)`` up to
    float reassociation."""
    from ..ops.implicit_esirkepov import (
        _axis_map,
        _axis_weights_E,
        _component_weights,
        _contract,
        gather_B_implicit,
    )

    sh, sn, _s0 = _axis_weights_E(t0, t0)
    comps = []
    for cx in range(3):
        cy, cz, w_sh, (sny, A), _ = _component_weights(cx, sh, sn, sn)
        # term1 == term2, A == 3 S2[cz]: E = 2 * contract(sh, sn, 3 sn)
        comps.append(
            2.0 * _contract(Eblk[:, cx],
                            _axis_map(cx, cy, cz, w_sh, sny, A))
        )
    E_p = jnp.stack(comps, axis=-1)
    B_p = gather_B_implicit(Bblk, t0)
    return E_p, B_p


def _one_segment_fields(Eblk, Bblk, t0, tn):
    """Collapsed :func:`_segment_fields` for moves that cross no
    node-cell face: one full-length segment, so the path average is a
    single implicit-Esirkepov gather (the other three segments of the
    general path are zero-length and contribute exactly zero)."""
    E_p = gather_E_implicit(Eblk, t0, tn)
    B_p = gather_B_implicit(Bblk, 0.5 * (t0 + tn))
    return E_p, B_p


def _cn_sweep(Eblk, Bblk, t0, p0, valid, dt, qm, d_steps, kc=0, rest=None):
    """Masked Crank-Nicolson Picard iteration for all particles at once
    (eccapfim/particles.cpp:126-156).  Positions are in grid units
    (t* = r/d, cell-relative handled upstream); velocities physical.

    With ``kc > 0`` the rows are pre-partitioned (crossers in the first
    ``kc`` columns); returns a misclassification count alongside.
    ``rest`` optionally passes the precomputed zero-displacement
    (E, B) gather (the classifier already needed it)."""
    v_over_d = p0 / d_steps
    fast = 0 < kc < t0.shape[1]

    def fields(tn):
        if not fast:
            E_p, B_p = _segment_fields(Eblk, Bblk, t0, tn)
            return E_p, B_p, jnp.zeros((), jnp.int32)
        E_c, B_c = _segment_fields(Eblk, Bblk, t0[:, :kc], tn[:, :kc])
        t0n, tnn = t0[:, kc:], tn[:, kc:]
        E_1, B_1 = _one_segment_fields(Eblk, Bblk, t0n, tnn)
        # Exact guard: a classified non-crosser whose iterate crossed a
        # face got the (invalid-across-breakpoints) single-segment
        # gather — count it so the host can redo the step exactly.
        viol = jnp.sum(
            jnp.any(jnp.round(tnn) != jnp.round(t0n), axis=-1)
            & valid[:, kc:], dtype=jnp.int32,
        )
        return (jnp.concatenate([E_c, E_1], axis=1),
                jnp.concatenate([B_c, B_1], axis=1), viol)

    tn0 = t0
    E_p, B_p = rest if rest is not None else _rest_fields(Eblk, Bblk, t0)

    def residue(pn, vh, E_p, B_p):
        return jnp.linalg.norm(
            (pn - p0) - dt * qm * (E_p + jnp.cross(vh, B_p)), axis=-1
        )

    cn_tol = CN_TOL if p0.dtype == jnp.float64 else CN_TOL_F32
    res0 = residue(p0, p0, E_p, B_p)
    target = cn_tol + cn_tol * res0
    alpha = 0.5 * dt * qm

    def body(state):
        it, tn, pn, E_p, B_p, res, active, nviol = state
        a = alpha * E_p
        b = alpha * B_p
        w = p0 + a
        b2 = jnp.sum(b * b, axis=-1, keepdims=True)
        vh = (w + jnp.cross(w, b) + b * jnp.sum(w * b, axis=-1, keepdims=True)) / (
            1.0 + b2
        )
        m = active[..., None]
        tn = jnp.where(m, t0 + (vh / d_steps) * dt, tn)
        pn = jnp.where(m, 2.0 * vh - p0, pn)
        E_n, B_n, viol = fields(tn)
        E_p = jnp.where(m, E_n, E_p)
        B_p = jnp.where(m, B_n, B_p)
        res_new = residue(pn, vh, E_p, B_p)
        res = jnp.where(active, res_new, res)
        done = res < target
        return (it + 1, tn, pn, E_p, B_p, res, active & ~done,
                jnp.maximum(nviol, viol))

    def cond(state):
        it, _tn, _pn, _E, _B, _res, active, _nv = state
        return jnp.logical_and(jnp.any(active & valid), it < CN_MAXIT)

    state = (
        jnp.asarray(0, jnp.int32), tn0, p0, E_p, B_p, res0,
        (res0 >= target) & valid, jnp.zeros((), jnp.int32),
    )
    (it, tn, pn, E_p, B_p, res, active,
     nviol) = jax.lax.while_loop(cond, body, state)
    vh = 0.5 * (pn + p0)
    return tn, pn, vh, it, active, nviol


def _segment_deposit(t0, tn, vh, scale):
    """4-segment path-averaged current deposit blocks
    (eccapfim/particles.cpp:158-170): per segment, scale * bs
    (dtau == dt, so dtau/dt == 1)."""
    taus = split_segments(t0, tn)
    dseg = tn - t0
    Jblk = 0.0
    for s in range(MAXSEG):
        a = taus[..., s][..., None]
        b = taus[..., s + 1][..., None]
        seg0 = t0 + a * dseg
        seg1 = t0 + b * dseg
        bs = (b - a)[..., 0] * scale  # [G, K]
        Jblk = Jblk + deposit_J_implicit(seg0, seg1, vh, bs)
    return Jblk


@partial(jax.jit, static_argnames=("geom", "qm", "a0", "kc"))
def _form_species(E_hk, B, st: BinnedState, geom: Geometry,
                  qm: float, a0: float, kc: int = 0):
    """One species' contribution to J(E_hk) plus its updated state.

    ``st`` is the start-of-step binned state (the ``previous_storage``
    analog, eccapfim/particles.h:28-30) — it stays fixed across residual
    evaluations; only the returned candidate state moves.

    ``kc > 0`` enables the crosser-compaction fast path (module
    docstring at ``_FIM_FAST``): probable face-crossers are moved to the
    first ``kc`` slot columns of their own cell row and only they pay
    the 4-segment path; the returned ``fallback`` count is non-zero iff
    a row held more crossers than ``kc`` or the conservative classifier
    missed one (checked exactly every Picard iterate), in which case the
    caller redoes the step on the general path.
    """
    t0 = cell_t(geom, st.r)
    p0, valid = st.p, st.valid
    fast = 0 < kc < t0.shape[1]
    fallback = jnp.zeros((), jnp.int32)
    d_steps = jnp.asarray(geom.cell_steps, dtype=E_hk.dtype)

    Eblk = gather_window_blocks(E_hk, geom)
    Bblk = gather_window_blocks(B, geom)

    rest = None
    if fast:
        # Conservative per-particle crosser classification.
        # Displacement estimate from the start-of-step velocity; the
        # margin bounds how far any Picard iterate's midpoint velocity
        # can drift from it — |vh - p0| <= dt/2 |qm| (|E| + |vh||B|) at
        # the particle's own location, taken from the zero-displacement
        # field gather (which the sweep needs anyway) with a 2x cushion
        # for field variation along the path.  A global-field-max bound
        # was measured uselessly loose (it classified ~1/3 of all
        # particles once the instability fields grew, overflowing kc
        # every step); the exact per-iterate post-check stays the
        # authority either way.
        E_p0, B_p0 = _rest_fields(Eblk, Bblk, t0)
        e_loc = jnp.linalg.norm(E_p0, axis=-1)
        b_loc = jnp.linalg.norm(B_p0, axis=-1)
        p_loc = jnp.linalg.norm(p0, axis=-1)
        dv = (abs(qm) * geom.dt) * (e_loc + p_loc * b_loc)  # [G, K]
        d_est = p0 * (geom.dt / d_steps)
        marg = (dv[..., None] * geom.dt) / d_steps + 2e-3
        r0 = jnp.round(t0)
        hi = jnp.round(t0 + (jnp.maximum(d_est, 0.0) + marg)) != r0
        lo = jnp.round(t0 - (jnp.maximum(-d_est, 0.0) + marg)) != r0
        pred = jnp.any(hi | lo, axis=-1) & valid
        counts = jnp.sum(pred, axis=1, dtype=jnp.int32)
        fallback = (jnp.max(counts) > kc).astype(jnp.int32)
        # Stable in-row partition: crossers first (key 0 < key 1).
        order = jnp.argsort(
            jnp.logical_not(pred).astype(jnp.int32), axis=1, stable=True
        )
        t0 = jnp.take_along_axis(t0, order[..., None], axis=1)
        p0 = jnp.take_along_axis(p0, order[..., None], axis=1)
        valid = jnp.take_along_axis(valid, order, axis=1)
        rest = (jnp.take_along_axis(E_p0, order[..., None], axis=1),
                jnp.take_along_axis(B_p0, order[..., None], axis=1))

    tn, pn, vh, iters, nonconv, nviol = _cn_sweep(
        Eblk, Bblk, t0, p0, valid, geom.dt, qm, d_steps,
        kc if fast else 0, rest,
    )

    # Deposit the path-averaged current of the *converged* move.
    valid_f = valid.astype(E_hk.dtype)
    if fast:
        Jblk = _segment_deposit(t0[:, :kc], tn[:, :kc], vh[:, :kc],
                                a0 * valid_f[:, :kc])
        Jblk = Jblk + deposit_J_implicit(t0[:, kc:], tn[:, kc:],
                                         vh[:, kc:], a0 * valid_f[:, kc:])
        fallback = fallback + nviol
    else:
        Jblk = _segment_deposit(t0, tn, vh, a0 * valid_f)
    J = scatter_blocks(Jblk, geom)

    # Candidate state (committed after the nonlinear solve converges):
    # tn/t0 are cell-relative, absolute grid-units = st.r + (tn - t0).
    if fast:
        # Undo the in-row partition so slot order matches the input
        # state (backup files and per-slot diagnostics see stable slots).
        inv = jnp.argsort(order, axis=1)
        r_perm = jnp.take_along_axis(st.r, order[..., None], axis=1)
        r_new_g = jnp.take_along_axis(r_perm + (tn - t0),
                                      inv[..., None], axis=1)
        pn = jnp.take_along_axis(pn, inv[..., None], axis=1)
    else:
        r_new_g = st.r + (tn - t0)
    avg_it = jnp.asarray(iters, E_hk.dtype)
    # Fast-particle guard: the 4-segment path split (split_segments)
    # handles at most one face crossing per axis; a per-axis move >= 1
    # cell would silently lose charge outside the 6-wide window.  The
    # reference instead sub-steps arbitrarily many crossings with a DDA
    # while-loop and asserts progress (cell_traversal.cpp:3-77) — here
    # the violation is surfaced as a flagged error, like solver
    # non-convergence.
    max_disp = jnp.max(
        jnp.where(valid[..., None], jnp.abs(tn - t0), 0.0)
    )
    return J, r_new_g, pn, avg_it, jnp.sum(nonconv), max_disp, fallback


@partial(jax.jit, static_argnames=("geom", "mesh"), donate_argnums=(0,))
def _commit_state(st: BinnedState, geom: Geometry, mesh=None):
    """Boundary map + checked migration of the converged particle move
    (after_iteration -> update_cells, eccapfim/simulation.cpp:106-129)."""
    return migrate_checked(st, geom, mesh)


class EccapfimSimulation(Simulation):
    scheme_name = "eccapfim"

    def initialize_implementation(self) -> None:
        self.phase_timings: dict[str, float] = {}
        self.conv_history: list[float] = []

    def initialize(self) -> None:
        super().initialize()
        # Auto-append the scheme's ConvergenceHistory table
        # (eccapfim/simulation.cpp:29).
        from ..diagnostics.convergence_history import ConvergenceHistory

        self.diagnostics.append(ConvergenceHistory(self))

    def _fused_residual(self, fast: bool = False):
        """Build (once) the fully fused preconditioned-residual jit.

        One device dispatch evaluates every species' Crank-Nicolson
        sweep + current deposit, the Maxwell residual F, and the
        Chebyshev-preconditioned G = 2 M^{-1} F (form_function,
        eccapfim/simulation.cpp:200-246) — the round-3 version ran the
        curls and the preconditioner as ~10 eager ops per evaluation,
        each paying the backend's ~1.6 ms dispatch.  Per-species
        byproducts (J_s, candidate states, CN stats) ride along as
        device outputs; nothing syncs until after the solve.

        Preconditioning: M = I + dt^2/4 curl- curl+ is the stiff
        linear part of F.  The raw fixed point x <- x - F(x) has
        spectral radius ~ dt^2 lam_max(curlcurl)/4 (27 at the golden
        config) and diverges; the Chebyshev inverse
        (solvers/spectral.py) leaves only the O(dt) plasma response,
        which Anderson contracts in a handful of iterations — the role
        of the reference's NGMRES+EW inner solves
        (eccapfim/simulation.cpp:358-392).
        """
        cache = getattr(self, "_fused_residual_cache", None)
        if cache is None:
            cache = self._fused_residual_cache = {}
        fn = cache.get(fast)
        if fn is not None:
            return fn
        import math

        from functools import partial as _partial

        from ..solvers.spectral import make_matM_preconditioner

        geom = self.geom
        params = tuple(
            (sp.params.qm, sp.params.q * sp.params.n_Np)
            for sp in self.species if sp.n > 0
        )
        # matM in spectral.py is (2 + shift) I + (dt'^2/2) curlcurl;
        # with dt' = dt/sqrt(2):  matM = 2 I + (dt^2/2) curlcurl = 2 M.
        P = make_matM_preconditioner(geom, geom.dt / math.sqrt(2.0),
                                     dtype=self.E.dtype, mesh=self.mesh)
        steps, bounds = geom.cell_steps, geom.bounds

        @_partial(jax.jit, static_argnums=())
        def fused(E_hk, E, B, states):
            J = jnp.zeros_like(E)
            pend, its = [], []
            max_disp = jnp.zeros((), E.dtype)
            nonconv = jnp.zeros((), jnp.int32)
            fb = jnp.zeros((), jnp.int32)
            for st, (qm, a0) in zip(states, params):
                kc = _pick_kc(st.p.shape[1]) if fast else 0
                J_s, r_new_g, pn, avg_it, nc, md, fb_s = _form_species(
                    E_hk, B, st, geom, qm, a0, kc)
                fb = fb + fb_s
                J = J + J_s
                # Keep the per-species current: the reference stores J
                # per species (src/interfaces/particles.h:20) and the
                # charge-conservation columns are species-local.
                pend.append((r_new_g, pn, J_s))
                its.append(avg_it)
                max_disp = jnp.maximum(max_disp, md)
                nonconv = nonconv + nc.astype(jnp.int32)
            F = (
                E_hk
                + 0.25 * geom.dt**2
                * curl_negative(curl_positive(E_hk, steps, bounds),
                                steps, bounds)
                - E
                + 0.5 * geom.dt * J
                - 0.5 * geom.dt * curl_negative(B, steps, bounds)
            )
            G = 2.0 * P(F, 0.0)
            return G, (J, tuple(pend), jnp.stack(its) if its else
                       jnp.zeros(0), max_disp, nonconv, fb)

        lam_cc = 4.0 * (1.0 / geom.dx**2 + 1.0 / geom.dy**2
                        + 1.0 / geom.dz**2)
        cache[fast] = (fused, 1.0 + 0.25 * geom.dt**2 * lam_cc)
        return cache[fast]

    def _solve_once(self, states, atol, rtol, fast: bool):
        """One nonlinear solve plus ONE fused device->host stats fetch.

        Returns a dict of host scalars (solver state, CN stats, the
        fast-path guard) and the device-side per-species byproducts.
        """
        sim = self
        fused, _ = self._fused_residual(fast)
        fb_box = [jnp.zeros((), jnp.int32)]

        def G(x):
            g, out = fused(x, sim.E, sim.B, states)
            sim._last_out = out  # device-side; synced after the solve
            # Lazily accumulate the fast-path guard over EVERY
            # evaluation — a contaminated mid-solve iterate must
            # trigger the general-path redo even if the final one is
            # clean (its contribution reached the Anderson window).
            fb_box[0] = jnp.maximum(fb_box[0], out[5])
            return g

        if _ANDERSON_MODE == "host":
            result = anderson_solve(
                G, self.E, atol=atol, rtol=rtol, maxit=MAXIT, m=10,
            )
            aux = self._last_out
            conv_hist = result.history
            res_x = result.x
            res_it = int(result.iterations)
            res_rnorm = float(result.residual_norm)
            res_conv = bool(result.converged)
        else:
            res = anderson_solve_device(
                lambda x: fused(x, sim.E, sim.B, states), self.E,
                atol=atol, rtol=rtol, maxit=MAXIT, m=10,
            )
            aux = res.aux
            res_x = res.x
        J_last, pend, its, max_disp_d, nonconv_d, fb_last = aux
        # Flagged-error surfacing for the committed (last) particle sweep:
        # per-axis displacement must stay below one cell for the 4-segment
        # split to be exact, and every particle's CN Picard iteration must
        # have converged (the reference aborts on both,
        # cell_traversal.cpp / crank_nicolson_push.cpp:69-70).  ONE fused
        # fetch brings back every scalar the host needs — the CN stats,
        # the solver state, the fast-path guard, and the convergence
        # history.
        ftype = (jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
        head = [max_disp_d.astype(ftype), nonconv_d.astype(ftype),
                jnp.maximum(fb_box[0], fb_last).astype(ftype)]
        if _ANDERSON_MODE != "host":
            head += [res.iterations.astype(ftype),
                     res.residual_norm.astype(ftype),
                     res.converged.astype(ftype)]
        parts = [jnp.stack(head), its.astype(ftype)]
        if _ANDERSON_MODE != "host":
            parts.append(res.history.astype(ftype))
        stats = np.asarray(jnp.concatenate(parts))
        n_live = sum(1 for s in self.species if s.n > 0)
        if _ANDERSON_MODE != "host":
            res_it = int(stats[3])
            res_rnorm = float(stats[4])
            res_conv = bool(stats[5])
            sp_its = stats[6:6 + n_live]
            conv_hist = list(stats[6 + n_live:6 + n_live + res_it + 1])
        else:
            sp_its = stats[3:3 + n_live]
        return {
            "x": res_x, "history": conv_hist, "iterations": res_it,
            "residual_norm": res_rnorm, "converged": res_conv,
            "J": J_last, "pend": pend, "sp_its": sp_its,
            "max_disp": float(stats[0]), "nonconv": int(stats[1]),
            "fallback": int(stats[2]),
        }

    def timestep_implementation(self, t: int) -> None:
        geom = self.geom
        t0 = time.perf_counter()

        # init_iteration: guess E^{n+1/2,0} = E^n
        # (eccapfim/simulation.cpp:46-66).
        _, bound = self._fused_residual(False)
        states = tuple(sp.state for sp in self.species if sp.n > 0)

        if self.E.dtype == jnp.float64:
            atol = rtol = ATOL / bound
        else:
            import math as _math

            # RMS-scaled absolute floor only; the relative target stays
            # at the documented RTOL so a step with initial residual
            # r0 > 1 does not converge to a looser-than-RMS threshold
            # (advisor r4 finding).
            atol = ATOL_F32 * _math.sqrt(self.E.size) / bound
            rtol = RTOL / bound
        fast = _FIM_FAST and _ANDERSON_MODE == "host"
        out = self._solve_once(states, atol, rtol, fast)
        if fast and out["fallback"]:
            # The conservative crosser classifier missed a particle or
            # a cell row overflowed the kc crosser columns: the solve
            # is untrusted — redo the whole step on the exact general
            # path (the solve mutated nothing yet, it is pure in
            # (E, B, states)).
            log.info(
                "  eccapfim fast path flagged %d misclassified/overflow "
                "particles at t=%d; redoing the step on the general "
                "4-segment path", out["fallback"], t,
            )
            self._fallback_steps = getattr(self, "_fallback_steps", 0) + 1
            out = self._solve_once(states, atol, rtol, False)

        res_x = out["x"]
        res_it = out["iterations"]
        res_rnorm = out["residual_norm"]
        res_conv = out["converged"]
        pend = out["pend"]
        max_disp, nonconv = out["max_disp"], out["nonconv"]
        self._J_last = out["J"]
        for sp, it_count in zip(
                (s for s in self.species if s.n > 0), out["sp_its"]):
            sp.cn_iterations = float(it_count)
        self.conv_history = out["history"]
        self.phase_timings["calc_iteration"] = time.perf_counter() - t0
        if max_disp >= 1.0:
            raise RuntimeError(
                f"eccapfim: particle moved {max_disp:.2f} cells along one "
                f"axis in a single dt — beyond the one-crossing-per-axis "
                f"segment split; reduce dt (v_th dt/dx guard) or the "
                f"field amplitude"
            )
        if nonconv:
            raise RuntimeError(
                f"eccapfim: Crank-Nicolson iteration did not converge for "
                f"{nonconv} particles (maxit={CN_MAXIT})"
            )

        if not res_conv:
            raise RuntimeError(
                f"eccapfim nonlinear solve did not converge: "
                f"|F|={res_rnorm:.3e} after {res_it} its"
            )
        log.info(
            "  Nonlinear solve converged in %d iterations, |F|=%.3e",
            res_it, res_rnorm,
        )

        sol = res_x
        # after_iteration (eccapfim/simulation.cpp:106-129)
        self.E = 2.0 * sol - self.E
        self.B = self.B - geom.dt * curl_positive(
            sol, geom.cell_steps, geom.bounds
        )
        self.J = self._J_last

        # Commit particle states from the last residual evaluation
        # (evaluated at the converged solution) and wrap coordinates.
        pend_iter = iter(pend)
        for sp in self.species:
            if sp.n == 0:
                sp.J = jnp.zeros_like(self.J)
                continue
            r_new_g, pn, J_s = next(pend_iter)
            sp.state, load = _commit_state(
                BinnedState(r=r_new_g, p=pn, valid=sp.state.valid), geom,
                self.mesh,
            )
            sp.J = J_s
            self.check_load(sp, load)
        self.refresh_counts()
