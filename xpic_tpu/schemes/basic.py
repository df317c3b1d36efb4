"""Explicit leapfrog scheme: FDTD + Boris push + Esirkepov current.

Reference: src/impls/basic/simulation.cpp:30-100 and
src/impls/basic/particles.cpp:17-56.  One timestep:

1. ``push_particles``: B^n = B^{n-1/2} - (dt/2) curl+ E^n (external B0 is
   excluded from the rotation); for each species, half drift -> order-2
   Yee gather of (E, B) -> Boris vEB velocity update -> half drift ->
   Esirkepov current deposit over the full old->new move.
2. ``push_fields``: B^{n+1/2} = B^n - (dt/2) curl+ E^n;
   E^{n+1} = E^n + dt curl- B^{n+1/2} - dt J.

Species live in the persistent cell-binned ``BinnedState``; the push
kernel ends with the capacity-checked migration.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import Geometry
from ..ops.binning import BinnedState, migrate_checked
from ..ops.gather_scatter import (
    B_STAGGER,
    E_STAGGER,
    cell_t,
    esirkepov_current,
    gather_vector,
)
from ..ops.stencil import curl_negative, curl_positive
from ..pushers import update_vEB
from .base import Simulation


@partial(jax.jit, static_argnames=("geom", "qm", "alpha"), donate_argnums=(2,))
def _push_species(E, B, st: BinnedState, geom: Geometry, qm: float,
                  alpha: float):
    """Boris push + Esirkepov deposit for one species;
    returns (st', J_s, load)."""
    dt = geom.dt
    d = jnp.asarray(geom.cell_steps, dtype=st.r.dtype)

    rg0 = st.r  # [G, K, 3] in grid units, binned by the cell of rg0
    p0 = st.p
    v_over_d = p0 / d

    # Half drift, gather fields at the mid position, rotate, half drift.
    rg_half = rg0 + v_over_d * (0.5 * dt)
    t_half = cell_t(geom, rg_half)
    # Anchor -2/width 6 tolerates up to one cell of drift off the binning
    # cell (the reference re-anchors per particle, src/utils/shape.cpp:31-41).
    E_p = gather_vector(E, t_half, st.valid, geom, order=2, width=6,
                        anchor=-2, stagger=E_STAGGER)
    B_p = gather_vector(B, t_half, st.valid, geom, order=2, width=6,
                        anchor=-2, stagger=B_STAGGER)
    p1 = update_vEB(dt, qm, p0, E_p, B_p)
    p1 = jnp.where(st.valid[..., None], p1, 0.0)
    rg1 = rg_half + (p1 / d) * (0.5 * dt)

    J_s = esirkepov_current(
        cell_t(geom, rg0), cell_t(geom, rg1), st.valid, alpha, geom
    )

    st2, load = migrate_checked(
        BinnedState(r=rg1, p=p1, valid=st.valid), geom
    )
    return st2, J_s, load


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

        # B^{n-1/2} -> B^{n} for the particle push.
        self.B = _half_rotation(self.E, self.B, self.B0, geom)

        J = jnp.zeros_like(self.J)
        loads = []
        for sp in self.species:
            if sp.n == 0:
                sp.J = jnp.zeros_like(self.J)
                continue
            alpha = sp.params.q * sp.params.n_Np / (6.0 * geom.dt)
            sp.state, J_s, load = _push_species(
                self.E, self.B, sp.state, geom, sp.params.qm, alpha
            )
            sp.J = J_s
            J = J + J_s
            loads.append((sp, load))
        self.J = J

        self.E, self.B, self._dE_norm = _push_fields(
            self.E, self.B, self.B0, self.J, geom
        )

        for sp, load in loads:
            self.check_load(sp, load)
        self.refresh_counts()
