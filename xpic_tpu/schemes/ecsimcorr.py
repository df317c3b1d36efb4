"""ecsimcorr: ECSIM + charge-conserving correction + energy renormalization.

Reference: src/impls/ecsimcorr/{simulation,particles}.cpp.  Extends the
ECSIM step (ecsimcorr/simulation.cpp:21-32):

1. ``clear_sources``  : also zero the Esirkepov current currJe and
                        snapshot each species' kinetic energy.
2. ``first_push``     : half drift r += v dt/2 with an Esirkepov deposit
                        into currJe, then the ECSIM fill (currI, matL).
3. ``advance_fields`` : the ECSIM predict solve -> Ep.
4. ``second_push``    : Boris vEB with (Ep, B), second half drift plus
                        Esirkepov deposit; accumulates the predicted
                        field work pred_w = sum q mpw (v_avg . E_p).
5. ``correct_fields`` : solve matM Ec = 2 E - dt currJe + dt curl-(B-B0)
                        on the *constant* SPD matM (CG).
6. ``final_update``   : per species, velocity renormalization by
                        lambda = sqrt(1 + dt (corr_w - pred_w)/K)
                        (ecsimcorr/particles.cpp:93-126), then the ECSIM
                        final update with Ep <- Ec.

All particle work runs on the persistent cell-binned ``BinnedState``;
the half-drift phases migrate with a capacity-checked rebin.
"""

from __future__ import annotations

import logging
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Geometry
from ..ops.binning import (
    BinnedState,
    kinetic_energy_state,
    migrate_checked,
)
from ..ops.ecsim_blocks import gather_slot_fields, s1_slot_weights
from ..ops.gather_scatter import (
    B_STAGGER,
    cell_t,
    esirkepov_current,
    gather_vector,
)
from ..ops.stencil import curl_negative, curl_positive
from ..pushers import update_vEB
from ..solvers import cg
from .ecsim import (
    ATOL,
    MAXIT,
    RTOL,
    EcsimSimulation,
    _advance_fields,
    _final_update,
)

log = logging.getLogger("xpic")


@partial(jax.jit, static_argnames=("geom", "alpha", "mesh"),
         donate_argnums=(0,))
def _half_drift_deposit(st: BinnedState, geom: Geometry, alpha: float,
                        mesh=None):
    """r += v dt/2 with Esirkepov deposit over the half move, then the
    checked migration (ecsimcorr/particles.cpp:27-50)."""
    d = jnp.asarray(geom.cell_steps, dtype=st.r.dtype)
    t0 = cell_t(geom, st.r)
    rg1 = st.r + (st.p / d) * (0.5 * geom.dt)
    t1 = cell_t(geom, rg1)
    J_inc = esirkepov_current(t0, t1, st.valid, alpha, geom)
    st2, load = migrate_checked(
        BinnedState(r=rg1, p=st.p, valid=st.valid), geom, mesh
    )
    return st2, J_inc, load


@partial(jax.jit,
         static_argnames=("geom", "qm", "qn_Np", "alpha", "mesh"),
         donate_argnums=(2,))
def _second_push_corr(Ep, B, st: BinnedState, geom: Geometry,
                      qm: float, qn_Np: float, alpha: float, mesh=None):
    """Boris vEB + second half drift + Esirkepov deposit + pred_w
    (ecsimcorr/particles.cpp:52-92)."""
    t = cell_t(geom, st.r)
    W = s1_slot_weights(t)
    E_p = gather_slot_fields(Ep, W, geom)
    E_p = jnp.where(st.valid[..., None], E_p, 0.0)
    B_p = gather_vector(B, t, st.valid, geom, order=1, width=3, anchor=-1,
                        stagger=B_STAGGER)
    p0 = st.p
    p1 = update_vEB(geom.dt, qm, p0, E_p, B_p)
    p1 = jnp.where(st.valid[..., None], p1, 0.0)

    d = jnp.asarray(geom.cell_steps, dtype=st.r.dtype)
    rg1 = st.r + (p1 / d) * (0.5 * geom.dt)
    J_inc = esirkepov_current(t, cell_t(geom, rg1), st.valid, alpha, geom)

    pred_w = qn_Np * jnp.sum(
        jnp.where(st.valid, 0.5 * jnp.sum((p0 + p1) * E_p, axis=-1), 0.0)
    )

    st2, load = migrate_checked(
        BinnedState(r=rg1, p=p1, valid=st.valid), geom, mesh
    )
    return st2, J_inc, pred_w, load


@partial(jax.jit, static_argnames=("geom", "mesh"))
def _correct_fields(E, B, B0, currJe, geom: Geometry, mesh=None):
    """Solve matM Ec = 2 E - dt currJe + dt curl-(B - B0) by CG
    (matM is constant SPD; ecsimcorr/simulation.cpp:52-63,131-133)."""
    steps, bounds = geom.cell_steps, geom.bounds
    half_dt2 = 0.5 * geom.dt * geom.dt

    def matM(x):
        return 2.0 * x + half_dt2 * curl_negative(
            curl_positive(x, steps, bounds), steps, bounds
        )

    rhs = (
        2.0 * E - geom.dt * currJe
        + geom.dt * curl_negative(B - B0, steps, bounds)
    )
    from ..solvers.spectral import make_matM_preconditioner

    P = make_matM_preconditioner(geom, geom.dt, dtype=E.dtype, mesh=mesh)
    M_inv = (lambda v: P(v, 0.0)) if P is not None else None
    # The Chebyshev(12) preconditioner (solvers/spectral.py) collapses
    # the curl-curl spread; CG converges in a handful of iterations and
    # verifies the true-residual tolerance.
    res = cg(matM, rhs, x0=E, rtol=RTOL, atol=ATOL, maxit=MAXIT, M_inv=M_inv)
    return res.x, res.iterations, res.residual_norm, res.converged


@partial(jax.jit, static_argnames=("geom", "m_mpw"), donate_argnums=(0,))
def _renormalize(st: BinnedState, currJe_s, Ec, pred_w, K0,
                 geom: Geometry, m_mpw: float):
    """Velocity renormalization lambda = sqrt(1 + dt (corr_w - pred_w)/K)
    (ecsimcorr/particles.cpp:93-126).  Returns the scaled state and the
    bookkeeping stats [lambda_dK, pred_dK, corr_dK, pred_w, corr_w]."""
    corr_w = jnp.sum(currJe_s * Ec)
    K = kinetic_energy_state(st, m_mpw)
    lambda2 = jnp.where(
        K > 0.0, 1.0 + geom.dt * (corr_w - pred_w) / jnp.maximum(K, 1e-300), 1.0
    )
    lam = jnp.sqrt(lambda2)
    p = jnp.where(st.valid[..., None], st.p * lam, 0.0)
    stats = jnp.stack([
        (lambda2 - 1.0) * K,  # lambda_dK
        K - K0,               # pred_dK
        lambda2 * K - K0,     # corr_dK
        pred_w,
        corr_w,
    ])
    return BinnedState(r=st.r, p=p, valid=st.valid), stats


class EcsimcorrSimulation(EcsimSimulation):
    scheme_name = "ecsimcorr"

    def initialize_implementation(self) -> None:
        super().initialize_implementation()
        self.Ec = jnp.zeros_like(self.E)

    def clear_sources(self) -> None:
        super().clear_sources()
        self.currJe = jnp.zeros_like(self.J)
        for sp in self.species:
            # Device scalar; consumed inside _renormalize (no host sync).
            sp.energy0 = kinetic_energy_state(
                sp.state, sp.params.m * sp.params.n_Np
            )

    def first_push(self) -> None:
        for sp in self.species:
            if sp.n == 0:
                sp.currJe = jnp.zeros_like(self.J)
                sp._load = None
                continue
            alpha = sp.params.q * sp.params.n_Np / (6.0 * self.geom.dt)
            sp.state, J_inc, sp._load = _half_drift_deposit(
                sp.state, self.geom, alpha, self.mesh
            )
            sp.currJe = J_inc
        self.fill_ecsim_current()

    def second_push(self) -> None:
        for sp in self.species:
            if sp.n == 0:
                continue
            pr = sp.params
            alpha = pr.q * pr.n_Np / (6.0 * self.geom.dt)
            sp.state, J_inc, pred_w, load2 = _second_push_corr(
                self.Ep, self.B, sp.state, self.geom,
                pr.qm, pr.q * pr.n_Np, alpha, self.mesh,
            )
            # Keep the max of the two half-step migrations' loads.
            if sp._load is not None:
                sp._load = jnp.maximum(sp._load, load2)
            else:
                sp._load = load2
            sp.currJe = sp.currJe + J_inc
            sp.pred_w = pred_w
            self.currJe = self.currJe + sp.currJe

    def advance_fields(self) -> None:
        # Defer the convergence fetch: the step's ONE host sync happens
        # at the end of timestep_implementation (VERDICT r4 #5).
        import os as _os

        prev = (getattr(self, "_adv_prev", None)
                if _os.environ.get("XPIC_WARM_START") == "1" else None)
        self.Ep, its, rnorm, ok, rhs = _advance_fields(
            self.E, self.B, self.B0, self.currI, self._L, self.geom,
            mesh=self.mesh, prev=prev,
        )
        self._adv_prev = (self.Ep, rhs)
        self._adv_solve = (its, rnorm, ok)

    def correct_fields(self) -> None:
        self.Ec, its, rnorm, ok = _correct_fields(
            self.E, self.B, self.B0, self.currJe, self.geom, mesh=self.mesh
        )
        self._corr_solve = (its, rnorm, ok)

    def _matL_apply(self, x):
        """Apply the step's accumulated mass matrix in whichever
        representation the active strategy produced (dense blocks or
        the matrix-free operand tuple)."""
        if isinstance(self._L, tuple):
            from ..ops.mass_free import MassOp, mass_apply

            ops, _ = self._L
            if isinstance(ops, MassOp):
                ops = (ops,)
            return mass_apply(x, ops, self.geom) if ops \
                else jnp.zeros_like(x)
        from ..ops.ecsim_blocks import apply_blocks

        return apply_blocks(self._L, x, self.geom)

    def final_update(self) -> None:
        for sp in self.species:
            if sp.n == 0:
                sp.corr_stats = dict(lambda_dK=0.0, pred_dK=0.0, corr_dK=0.0,
                                     pred_w=0.0, corr_w=0.0)
                sp._stats_d = None
                continue
            sp.state, stats = _renormalize(
                sp.state, sp.currJe, self.Ec,
                getattr(sp, "pred_w", jnp.zeros(())), sp.energy0,
                self.geom, sp.params.m * sp.params.n_Np,
            )
            sp._stats_d = stats  # device; fetched once at end of step

        # Scheme-health invariant: the ECSIM current evaluated at the
        # corrected field must match the Esirkepov current,
        # ||currJe - (currI + matL Ec)|| (ecsimcorr/simulation.cpp:76-83)
        # — computed before the swap, with the matrix-free apply on the
        # f32 speed path (no L blocks ever materialize).
        self._consistency_d = jnp.linalg.norm(
            (self.currJe - (self.currI + self._matL_apply(self.Ec))
             ).ravel())

        self.Ep, self.Ec = self.Ec, self.Ep  # VecSwap (ecsimcorr/simulation.cpp:85)
        self.E, self.B = _final_update(self.E, self.B, self.Ep, self.geom)

    def _host_sync(self) -> None:
        """The step's single host round-trip: solver health, the
        consistency norm, per-species renormalization stats and
        migration loads come back in ONE fused fetch (the reference
        syncs per phase because PETSc is host-resident; here every
        deferred scalar rides one device->host copy, VERDICT r4 #5)."""
        ftype = self.E.dtype
        parts = [
            jnp.stack([v.astype(ftype) for v in self._adv_solve]),
            jnp.stack([v.astype(ftype) for v in self._corr_solve]),
            self._consistency_d.astype(ftype)[None],
        ]
        live = [sp for sp in self.species
                if getattr(sp, "_stats_d", None) is not None]
        for sp in live:
            parts.append(sp._stats_d.astype(ftype))
            load = getattr(sp, "_load", None)
            parts.append(load.astype(ftype) if load is not None
                         else jnp.full(3, -1.0, ftype))
        vals = np.asarray(jnp.concatenate(parts), np.float64)

        adv_its, adv_rnorm, adv_ok = vals[0], vals[1], vals[2]
        corr_its, corr_rnorm, corr_ok = vals[3], vals[4], vals[5]
        self._ksp_iters = int(adv_its)
        self.ksp_history.append(self._ksp_iters)
        if not adv_ok:
            raise RuntimeError(
                f"ECSIM field solve did not converge: |r|={adv_rnorm:.3e} "
                f"after {int(adv_its)} iterations"
            )
        if not corr_ok:
            raise RuntimeError(
                f"ecsimcorr correct solve did not converge: "
                f"|r|={corr_rnorm:.3e}"
            )
        self.correct_ksp_iters = int(corr_its)
        self.current_consistency_norm = float(vals[6])
        log.info("  Norm of the difference in ECSIM and Esirkepov "
                 "currents: %.7f", self.current_consistency_norm)
        off = 7
        for sp in live:
            s = vals[off:off + 5]
            sp.corr_stats = dict(
                lambda_dK=float(s[0]), pred_dK=float(s[1]),
                corr_dK=float(s[2]), pred_w=float(s[3]),
                corr_w=float(s[4]),
            )
            load = vals[off + 5:off + 8]
            if load[0] >= 0:
                self.check_load(sp, load.astype(np.int64))
            sp._load = None
            sp._stats_d = None
            off += 8

    def timestep_implementation(self, t: int) -> None:
        phases = [
            ("clear_sources", self.clear_sources),
            ("first_push", self.first_push),
            ("advance_fields", self.advance_fields),
            ("second_push", self.second_push),
            ("correct_fields", self.correct_fields),
            ("final_update", self.final_update),
        ]
        for name, fn in phases:
            t0 = time.perf_counter()
            fn()
            self.phase_timings[name] = time.perf_counter() - t0
        # The Esirkepov current is the scheme's J (ecsimcorr/simulation.cpp:16).
        self.J = self.currJe
        for sp in self.species:
            sp.J = getattr(sp, "currJe", jnp.zeros_like(self.J))
        self._host_sync()
        self.refresh_counts()
