"""ECSIM: energy-conserving semi-implicit scheme (Lapenta).

Reference: src/impls/ecsim/{simulation,particles}.cpp, after
https://doi.org/10.1016/j.jcp.2017.01.002.  One timestep
(ecsim/simulation.cpp:145-253):

1. ``first_push``     : r += v dt (no fields), then rebin.
2. ``fill``           : per particle, gather B (s1) -> implicit current
                        I_p into currI and rotation blocks into matL.
3. ``advance_fields`` : solve (matL + matM) E^{n+1/2} = 2 E^n
                        - dt currI + dt curl-(B^n - B0), with
                        matM x = 2 x + dt^2/2 curl-(curl+ x) applied
                        matrix-free.
4. ``second_push``    : gather E^{n+1/2}, B (s1) at the *new* positions,
                        Boris vEB velocity update.
5. ``final_update``   : E^{n+1} = 2 E^{n+1/2} - E^n;
                        B^{n+1} = B^n - dt curl+(E^{n+1/2}).

Solver budget: rtol=atol=1e-7, maxit=100 (ecsim/simulation.h:15-18);
non-convergence raises (KSPSetErrorIfNotConverged analog).
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, Geometry
from ..ops.binning import bin_sorted, scatter_back
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
from ..particles import ParticleArrays, apply_boundaries, cell_ids
from ..pushers import update_vEB
from ..solvers import gmres
from .base import Simulation

ATOL = 1e-7
RTOL = 1e-7
MAXIT = 100


@partial(jax.jit, static_argnames=("geom",), donate_argnums=(0,))
def _first_push(sp: ParticleArrays, geom: Geometry):
    """r += v dt (ecsim/particles.cpp:21-30) + boundary wrap."""
    r = sp.r + sp.p * geom.dt
    return apply_boundaries(ParticleArrays(r=r, p=sp.p, alive=sp.alive), geom)


@partial(jax.jit, static_argnames=("geom", "slots", "q", "m", "mpw"))
def _fill_species(B, sp: ParticleArrays, geom: Geometry, slots: int,
                  q: float, m: float, mpw: float):
    """One species' currI deposit and matL blocks
    (ecsim/particles.cpp:33-173)."""
    binned = bin_sorted(sp, geom, slots)
    t = cell_t(geom, binned.r)
    W = s1_slot_weights(t)
    B_p = gather_vector(B, t, binned.valid, geom, order=1, width=3, anchor=-1,
                        stagger=B_STAGGER)
    I_p, M = ecsim_particle_terms(
        B_p, binned.p, binned.valid, q=q, m=m, mpw=mpw, dt=geom.dt
    )
    currI = deposit_slots(I_p, W, geom)
    L = assemble_blocks(W, M)
    return currI, L


def _matA(L, geom: Geometry):
    steps, bounds = geom.cell_steps, geom.bounds
    half_dt2 = 0.5 * geom.dt * geom.dt

    def matvec(x):
        y = 2.0 * x + half_dt2 * curl_negative(
            curl_positive(x, steps, bounds), steps, bounds
        )
        return y + apply_blocks(L, x, geom)

    return matvec


@partial(jax.jit, static_argnames=("geom",))
def _advance_fields(E, B, B0, currI, L, geom: Geometry):
    """rhs = 2 E - dt currI + dt curl-(B - B0); solve matA Ep = rhs
    (ecsim/simulation.cpp:191-278).

    Left-preconditioned by the exact spectral inverse of
    matM + mean(diag matL) I (solvers/spectral.py) — the TPU-native
    replacement for PETSc's algebraic preconditioners.
    """
    from ..solvers.spectral import make_matM_preconditioner

    rhs = (
        2.0 * E
        - geom.dt * currI
        + geom.dt * curl_negative(B - B0, geom.cell_steps, geom.bounds)
    )
    P = make_matM_preconditioner(geom, geom.dt, dtype=E.dtype)
    M_inv = None
    if P is not None:
        # mean diagonal of matL over all grid unknowns (3 per cell)
        shift = jnp.einsum("gcici->", L) / (3.0 * geom.n_cells)
        M_inv = lambda v: P(v, shift)  # noqa: E731
    res = gmres(_matA(L, geom), rhs, x0=E, rtol=RTOL, atol=ATOL, maxit=MAXIT,
                M_inv=M_inv)
    return res.x, res.iterations, res.residual_norm, res.converged


@partial(jax.jit, static_argnames=("geom", "slots", "qm"), donate_argnums=(2,))
def _second_push(Ep, B, sp: ParticleArrays, geom: Geometry, slots: int,
                 qm: float):
    """Boris vEB with s1-interpolated fields at the already-moved
    positions (ecsim/particles.cpp:175-196)."""
    binned = bin_sorted(sp, geom, slots)
    t = cell_t(geom, binned.r)
    W = s1_slot_weights(t)
    E_p = gather_slot_fields(Ep, W, geom)
    E_p = jnp.where(binned.valid[..., None], E_p, 0.0)
    B_p = gather_vector(B, t, binned.valid, geom, order=1, width=3, anchor=-1,
                        stagger=B_STAGGER)
    p1 = update_vEB(geom.dt, qm, binned.p, E_p, B_p)
    p1 = jnp.where(binned.valid[..., None], p1, 0.0)
    n = sp.r.shape[0]
    p_new = scatter_back(binned, p1, n, ids=cell_ids(sp, geom))
    return ParticleArrays(r=sp.r, p=p_new, alive=sp.alive)


@partial(jax.jit, static_argnames=("geom",))
def _final_update(E, B, Ep, geom: Geometry):
    """E = 2 Ep - E; B -= dt curl+(Ep) (ecsim/simulation.cpp:241-253)."""
    E_new = 2.0 * Ep - E
    B_new = B - geom.dt * curl_positive(Ep, geom.cell_steps, geom.bounds)
    return E_new, B_new


class EcsimSimulation(Simulation):
    scheme_name = "ecsim"

    def initialize_implementation(self) -> None:
        self.Ep = jnp.zeros_like(self.E)
        self.phase_timings: dict[str, float] = {}

    # -- step phases (overridable by ecsimcorr) -----------------------
    def clear_sources(self) -> None:
        self.currI = jnp.zeros_like(self.J)
        self._L = None

    def first_push(self) -> None:
        for sp in self.species:
            sp.arrays = _first_push(sp.arrays, self.geom)
        self.rebin_all()
        self.fill_ecsim_current()

    def fill_ecsim_current(self) -> None:
        for sp in self.species:
            if sp.count() == 0:
                continue
            pr = sp.params
            currI_s, L_s = _fill_species(
                self.B, sp.arrays, self.geom, sp.slots,
                q=pr.q, m=pr.m, mpw=pr.n_Np,
            )
            sp.currI = currI_s
            self.currI = self.currI + currI_s
            self._L = L_s if self._L is None else self._L + L_s
        if self._L is None:
            shape = (self.geom.n_cells, 3, 12, 3, 12)
            self._L = jnp.zeros(shape)

    def advance_fields(self) -> None:
        self.Ep, its, rnorm, ok = _advance_fields(
            self.E, self.B, self.B0, self.currI, self._L, self.geom
        )
        self._ksp_iters = int(its)
        if not bool(ok):
            raise RuntimeError(
                f"ECSIM field solve did not converge: |r|={float(rnorm):.3e} "
                f"after {int(its)} iterations"
            )

    def second_push(self) -> None:
        for sp in self.species:
            if sp.count() == 0:
                continue
            sp.arrays = _second_push(
                self.Ep, self.B, sp.arrays, self.geom, sp.slots, sp.params.qm
            )

    def final_update(self) -> None:
        self.E, self.B = _final_update(self.E, self.B, self.Ep, self.geom)

    def timestep_implementation(self, t: int) -> None:
        phases = [
            ("clear_sources", self.clear_sources),
            ("first_push", self.first_push),
            ("advance_fields", self.advance_fields),
            ("second_push", self.second_push),
            ("final_update", self.final_update),
        ]
        for name, fn in phases:
            t0 = time.perf_counter()
            fn()
            self.phase_timings[name] = time.perf_counter() - t0
        # The ECSIM current is the scheme's J (ecsim/simulation.cpp:139).
        self.J = self.currI
        for sp in self.species:
            sp.J = getattr(sp, "currI", jnp.zeros_like(self.J))
