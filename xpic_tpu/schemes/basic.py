"""Explicit leapfrog scheme: FDTD + Boris push + Esirkepov current.

Reference: src/impls/basic/simulation.cpp:30-100 and
src/impls/basic/particles.cpp:17-56.  One timestep:

1. ``push_particles``: B^n = B^{n-1/2} - (dt/2) curl+ E^n (external B0 is
   excluded from the rotation); for each species, half drift -> order-2
   Yee gather of (E, B) -> Boris vEB velocity update -> half drift ->
   Esirkepov current deposit over the full old->new move.
2. ``push_fields``: B^{n+1/2} = B^n - (dt/2) curl+ E^n;
   E^{n+1} = E^n + dt curl- B^{n+1/2} - dt J.

The whole step is one jitted function over the field/species pytrees;
per-species work runs in the padded cell-binned layout.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, Geometry
from ..ops.binning import BinnedSpecies, bin_sorted, scatter_back
from ..ops.gather_scatter import (
    B_STAGGER,
    E_STAGGER,
    cell_t,
    esirkepov_current,
    gather_vector,
)
from ..ops.stencil import curl_negative, curl_positive
from ..particles import ParticleArrays, apply_boundaries, cell_ids
from ..pushers import update_vEB
from .base import Simulation, Species


@partial(jax.jit, static_argnames=("geom", "qm", "alpha", "slots"))
def _push_species(E, B, sp: ParticleArrays, geom: Geometry, qm: float,
                  alpha: float, slots: int):
    """Boris push + Esirkepov deposit for one species; returns (sp', J_s)."""
    dt = geom.dt
    d = jnp.asarray(geom.cell_steps, dtype=sp.r.dtype)
    binned = bin_sorted(sp, geom, slots)

    rg0 = binned.r  # [G, K, 3] in grid units, binned by the cell of rg0
    p0 = binned.p
    v_over_d = p0 / d

    # Half drift, gather fields at the mid position, rotate, half drift.
    rg_half = rg0 + v_over_d * (0.5 * dt)
    t_half = cell_t(geom, rg_half)
    # Anchor -2/width 6 tolerates up to one cell of drift off the binning
    # cell (the reference re-anchors per particle, src/utils/shape.cpp:31-41).
    E_p = gather_vector(E, t_half, binned.valid, geom, order=2, width=6,
                        anchor=-2, stagger=E_STAGGER)
    B_p = gather_vector(B, t_half, binned.valid, geom, order=2, width=6,
                        anchor=-2, stagger=B_STAGGER)
    p1 = update_vEB(dt, qm, p0, E_p, B_p)
    p1 = jnp.where(binned.valid[..., None], p1, 0.0)
    rg1 = rg_half + (p1 / d) * (0.5 * dt)

    t0 = cell_t(geom, rg0)
    t1 = cell_t(geom, rg1)
    J_s = esirkepov_current(t0, t1, binned.valid, alpha, geom)

    n = sp.r.shape[0]
    ids = cell_ids(sp, geom)
    r_new = scatter_back(binned, rg1 * d, n, ids=ids)
    p_new = scatter_back(binned, p1, n, ids=ids)
    sp_new = apply_boundaries(
        ParticleArrays(r=r_new, p=p_new, alive=sp.alive), geom
    )
    return sp_new, J_s


@partial(jax.jit, static_argnames=("geom",))
def _half_rotation(E, B, B0, geom: Geometry):
    """B -> B - (dt/2) curl+ (E), excluding the external field B0
    (reference: basic/simulation.cpp:45-52)."""
    return B - 0.5 * geom.dt * curl_positive(E, geom.cell_steps, geom.bounds)


@partial(jax.jit, static_argnames=("geom",))
def _push_fields(E, B, B0, J, geom: Geometry):
    """Faraday then Ampere update (reference: basic/simulation.cpp:74-100)."""
    steps, bounds = geom.cell_steps, geom.bounds
    dt = geom.dt
    Bi = B - B0
    Bi = Bi - 0.5 * dt * curl_positive(E, steps, bounds)
    E_new = E + dt * curl_negative(Bi, steps, bounds) - dt * J
    dE_norm = jnp.linalg.norm(E_new - E)
    return E_new, Bi + B0, dE_norm


class BasicSimulation(Simulation):
    scheme_name = "basic"

    def initialize_implementation(self) -> None:
        pass

    def timestep_implementation(self, t: int) -> None:
        geom = self.geom
        # Invariant: species arrays are cell-sorted here (initialize() and
        # the tail of every step rebin), as bin_sorted requires.

        # B^{n-1/2} -> B^{n} for the particle push.
        self.B = _half_rotation(self.E, self.B, self.B0, geom)

        J = jnp.zeros_like(self.J)
        for sp in self.species:
            if sp.count() == 0:
                sp.J = jnp.zeros_like(self.J)
                continue
            alpha = sp.params.q * sp.params.n_Np / (6.0 * geom.dt)
            sp.arrays, J_s = _push_species(
                self.E, self.B, sp.arrays, geom, sp.params.qm, alpha, sp.slots
            )
            sp.J = J_s
            J = J + J_s
        self.J = J

        self.E, self.B, self._dE_norm = _push_fields(
            self.E, self.B, self.B0, self.J, geom
        )

        # Re-sort by cell so diagnostics (and the next step) see a
        # correctly binned view — the reference's update_cells()
        # (basic/simulation.cpp:66).
        self.rebin_all()
