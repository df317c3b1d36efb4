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

The half-drift positions make particles move dt/2 before the ECSIM fill,
so this scheme rebins after each half step.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Geometry
from ..ops.binning import bin_sorted, scatter_back
from ..ops.ecsim_blocks import gather_slot_fields, s1_slot_weights
from ..ops.gather_scatter import (
    B_STAGGER,
    cell_t,
    esirkepov_current,
    gather_vector,
)
from ..ops.stencil import curl_negative, curl_positive
from ..particles import ParticleArrays, apply_boundaries, cell_ids, kinetic_energy
from ..pushers import update_vEB
from ..solvers import cg
from .base import Simulation
from .ecsim import ATOL, MAXIT, RTOL, EcsimSimulation, _final_update


@partial(jax.jit, static_argnames=("geom", "slots", "alpha"), donate_argnums=(0,))
def _half_drift_deposit(sp: ParticleArrays, geom: Geometry, slots: int,
                        alpha: float):
    """r += v dt/2 with Esirkepov deposit over the half move
    (ecsimcorr/particles.cpp:27-50)."""
    binned = bin_sorted(sp, geom, slots)
    d = jnp.asarray(geom.cell_steps, dtype=sp.r.dtype)
    rg0 = binned.r
    rg1 = rg0 + (binned.p / d) * (0.5 * geom.dt)
    J_inc = esirkepov_current(
        cell_t(geom, rg0), cell_t(geom, rg1), binned.valid, alpha, geom
    )
    n = sp.r.shape[0]
    r_new = scatter_back(binned, rg1 * d, n, ids=cell_ids(sp, geom))
    sp_new = apply_boundaries(
        ParticleArrays(r=r_new, p=sp.p, alive=sp.alive), geom
    )
    return sp_new, J_inc


@partial(jax.jit, static_argnames=("geom", "slots", "qm", "qn_Np"),
         donate_argnums=(2,))
def _second_push_corr(Ep, B, sp: ParticleArrays, geom: Geometry, slots: int,
                      qm: float, qn_Np: float, alpha: float):
    """Boris vEB + second half drift + Esirkepov deposit + pred_w
    (ecsimcorr/particles.cpp:52-92)."""
    binned = bin_sorted(sp, geom, slots)
    t = cell_t(geom, binned.r)
    W = s1_slot_weights(t)
    E_p = gather_slot_fields(Ep, W, geom)
    E_p = jnp.where(binned.valid[..., None], E_p, 0.0)
    B_p = gather_vector(B, t, binned.valid, geom, order=1, width=3, anchor=-1,
                        stagger=B_STAGGER)
    p0 = binned.p
    p1 = update_vEB(geom.dt, qm, p0, E_p, B_p)
    p1 = jnp.where(binned.valid[..., None], p1, 0.0)

    d = jnp.asarray(geom.cell_steps, dtype=sp.r.dtype)
    rg0 = binned.r
    rg1 = rg0 + (p1 / d) * (0.5 * geom.dt)
    J_inc = esirkepov_current(
        cell_t(geom, rg0), cell_t(geom, rg1), binned.valid, alpha, geom
    )

    pred_w = qn_Np * jnp.sum(
        jnp.where(binned.valid, 0.5 * jnp.sum((p0 + p1) * E_p, axis=-1), 0.0)
    )

    n = sp.r.shape[0]
    ids = cell_ids(sp, geom)
    r_new = scatter_back(binned, rg1 * d, n, ids=ids)
    p_new = scatter_back(binned, p1, n, ids=ids)
    sp_new = apply_boundaries(
        ParticleArrays(r=r_new, p=p_new, alive=sp.alive), geom
    )
    return sp_new, J_inc, pred_w


@partial(jax.jit, static_argnames=("geom",))
def _correct_fields(E, B, B0, currJe, geom: Geometry):
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

    P = make_matM_preconditioner(geom, geom.dt, dtype=E.dtype)
    M_inv = (lambda v: P(v, 0.0)) if P is not None else None
    # With the exact spectral inverse this converges in one iteration;
    # CG still verifies the true-residual tolerance.
    res = cg(matM, rhs, x0=E, rtol=RTOL, atol=ATOL, maxit=MAXIT, M_inv=M_inv)
    return res.x, res.iterations, res.residual_norm, res.converged


@jax.jit
def _scale_momenta(p, lam):
    return p * lam


class EcsimcorrSimulation(EcsimSimulation):
    scheme_name = "ecsimcorr"

    def initialize_implementation(self) -> None:
        super().initialize_implementation()
        self.Ec = jnp.zeros_like(self.E)

    def clear_sources(self) -> None:
        super().clear_sources()
        self.currJe = jnp.zeros_like(self.J)
        for sp in self.species:
            sp.energy0 = float(kinetic_energy(sp.arrays, sp.params))

    def first_push(self) -> None:
        for sp in self.species:
            if sp.count() == 0:
                continue
            alpha = sp.params.q * sp.params.n_Np / (6.0 * self.geom.dt)
            sp.arrays, J_inc = _half_drift_deposit(
                sp.arrays, self.geom, sp.slots, alpha
            )
            sp.currJe = J_inc
        self.rebin_all()
        self.fill_ecsim_current()

    def second_push(self) -> None:
        for sp in self.species:
            if sp.count() == 0:
                continue
            pr = sp.params
            alpha = pr.q * pr.n_Np / (6.0 * self.geom.dt)
            sp.arrays, J_inc, pred_w = _second_push_corr(
                self.Ep, self.B, sp.arrays, self.geom, sp.slots,
                pr.qm, pr.q * pr.n_Np, alpha,
            )
            sp.currJe = sp.currJe + J_inc
            sp.pred_w = float(pred_w)
            self.currJe = self.currJe + sp.currJe
        self.rebin_all()

    def correct_fields(self) -> None:
        self.Ec, its, rnorm, ok = _correct_fields(
            self.E, self.B, self.B0, self.currJe, self.geom
        )
        if not bool(ok):
            raise RuntimeError(
                f"ecsimcorr correct solve did not converge: |r|={float(rnorm):.3e}"
            )

    def final_update(self) -> None:
        dt = self.geom.dt
        for sp in self.species:
            if sp.count() == 0:
                sp.corr_stats = dict(lambda_dK=0.0, pred_dK=0.0, corr_dK=0.0,
                                     pred_w=0.0, corr_w=0.0)
                continue
            # corr_w = <currJe_s, Ec> (ecsimcorr/particles.cpp:95)
            corr_w = float(jnp.sum(sp.currJe * self.Ec))
            K0 = sp.energy0
            K = float(kinetic_energy(sp.arrays, sp.params))
            pred_w = getattr(sp, "pred_w", 0.0)
            lambda2 = 1.0 + dt * (corr_w - pred_w) / K if K > 0 else 1.0
            lam = float(np.sqrt(lambda2))
            sp.arrays = ParticleArrays(
                r=sp.arrays.r,
                p=_scale_momenta(sp.arrays.p, lam),
                alive=sp.arrays.alive,
            )
            sp.corr_stats = dict(
                lambda_dK=(lambda2 - 1.0) * K,
                pred_dK=K - K0,
                corr_dK=lambda2 * K - K0,
                pred_w=pred_w,
                corr_w=corr_w,
            )

        self.Ep, self.Ec = self.Ec, self.Ep  # VecSwap (ecsimcorr/simulation.cpp:85)
        self.E, self.B = _final_update(self.E, self.B, self.Ep, self.geom)

    def timestep_implementation(self, t: int) -> None:
        import time as _time

        phases = [
            ("clear_sources", self.clear_sources),
            ("first_push", self.first_push),
            ("advance_fields", self.advance_fields),
            ("second_push", self.second_push),
            ("correct_fields", self.correct_fields),
            ("final_update", self.final_update),
        ]
        for name, fn in phases:
            t0 = _time.perf_counter()
            fn()
            self.phase_timings[name] = _time.perf_counter() - t0
        # The Esirkepov current is the scheme's J (ecsimcorr/simulation.cpp:16).
        self.J = self.currJe
        for sp in self.species:
            sp.J = getattr(sp, "currJe", jnp.zeros_like(self.J))
