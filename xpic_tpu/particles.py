"""Fixed-capacity structure-of-arrays particle storage.

The reference stores particles as one ``std::list<Point>`` per owned cell
(src/interfaces/particles.h:32) and migrates them between lists/ranks
each step (src/interfaces/particles.cpp:79-248).  Linked lists are
hostile to TPUs, so here a species is a pytree of dense arrays with a
static capacity and an aliveness mask:

* ``r``: [C, 3] positions (x, y, z) in c/w_pe;
* ``p``: [C, 3] momenta/velocities [me c] (non-relativistic pushes treat
  p as velocity, as the reference does, src/algorithms/boris_push.h:15);
* ``alive``: [C] bool.

"Migration" becomes recomputing flat cell ids and (optionally) a stable
sort by cell, which keeps deposits segment-summable and deterministic.
Capacity grows in buckets outside jit (injection commands run on host
between steps, like the reference's StepPresets,
src/interfaces/simulation.cpp:83-85), so jit caches stay warm until a
bucket boundary is crossed.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .config import Geometry, SortParameters, PERIODIC, REFLECTIVE


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ParticleArrays:
    """One species' dynamic state (a jit-able pytree)."""

    r: jax.Array  # [C, 3] float
    p: jax.Array  # [C, 3] float
    alive: jax.Array  # [C] bool

    @property
    def capacity(self) -> int:
        return self.r.shape[0]

    def count(self) -> jax.Array:
        return jnp.sum(self.alive)


def make_empty(capacity: int, dtype=jnp.float64) -> ParticleArrays:
    return ParticleArrays(
        r=jnp.zeros((capacity, 3), dtype=dtype),
        p=jnp.zeros((capacity, 3), dtype=dtype),
        alive=jnp.zeros((capacity,), dtype=bool),
    )


def round_capacity(n: int, bucket: int = 256) -> int:
    """Round a particle count up to a capacity bucket (>=1 bucket)."""
    return max(bucket, ((n + bucket - 1) // bucket) * bucket)


def from_numpy(r: np.ndarray, p: np.ndarray, capacity: int | None = None,
               dtype=jnp.float64) -> ParticleArrays:
    """Pack host-side particle data into a padded ParticleArrays."""
    n = r.shape[0]
    cap = capacity if capacity is not None else round_capacity(n)
    rj = np.zeros((cap, 3), dtype=np.float64)
    pj = np.zeros((cap, 3), dtype=np.float64)
    alive = np.zeros((cap,), dtype=bool)
    rj[:n] = r
    pj[:n] = p
    alive[:n] = True
    return ParticleArrays(
        r=jnp.asarray(rj, dtype=dtype),
        p=jnp.asarray(pj, dtype=dtype),
        alive=jnp.asarray(alive),
    )


def append(sp: ParticleArrays, r: np.ndarray, p: np.ndarray,
           bucket: int = 256) -> ParticleArrays:
    """Host-side append of new particles (used by Set/InjectParticles).

    Fills dead slots first; grows capacity by whole buckets only when
    needed so jit re-traces stay rare.
    """
    alive = np.array(sp.alive)
    r_old = np.array(sp.r)
    p_old = np.array(sp.p)
    n_new = r.shape[0]
    free = np.flatnonzero(~alive)
    use = min(len(free), n_new)
    if use:
        idx = free[:use]
        r_old[idx] = r[:use]
        p_old[idx] = p[:use]
        alive[idx] = True
    rest = n_new - use
    if rest > 0:
        old_cap = alive.shape[0]
        cap = round_capacity(old_cap + rest, bucket)
        grow = cap - old_cap
        r_old = np.concatenate([r_old, np.zeros((grow, 3))])
        p_old = np.concatenate([p_old, np.zeros((grow, 3))])
        alive = np.concatenate([alive, np.zeros((grow,), dtype=bool)])
        r_old[old_cap : old_cap + rest] = r[use:]
        p_old[old_cap : old_cap + rest] = p[use:]
        alive[old_cap : old_cap + rest] = True
    dtype = sp.r.dtype
    return ParticleArrays(
        r=jnp.asarray(r_old, dtype=dtype),
        p=jnp.asarray(p_old, dtype=dtype),
        alive=jnp.asarray(alive),
    )


def cell_coords(sp_r: jax.Array, geom: Geometry) -> jax.Array:
    """Integer cell coordinates [C, 3] (x, y, z) via floor(r / d)."""
    d = jnp.asarray([geom.dx, geom.dy, geom.dz], dtype=sp_r.dtype)
    return jnp.floor(sp_r / d).astype(jnp.int32)


def cell_ids(sp: ParticleArrays, geom: Geometry) -> jax.Array:
    """Flat cell id per particle; dead particles map to the overflow
    segment ``n_cells`` (so segment-sums drop them).

    Flat id = (z * ny + y) * nx + x, matching the z-major array layout.
    """
    c = cell_coords(sp.r, geom)
    cx = jnp.clip(c[:, 0], 0, geom.nx - 1)
    cy = jnp.clip(c[:, 1], 0, geom.ny - 1)
    cz = jnp.clip(c[:, 2], 0, geom.nz - 1)
    flat = (cz * geom.ny + cy) * geom.nx + cx
    return jnp.where(sp.alive, flat, geom.n_cells).astype(jnp.int32)


def sort_by_cell_impl(sp: ParticleArrays, geom: Geometry) -> ParticleArrays:
    """Stable sort of the species by flat cell id (dead slots sink to the end).

    This is the TPU replacement for ``update_cells_seq``
    (src/interfaces/particles.cpp:79-112): after it, per-cell segments
    are contiguous and deposits reduce over the binned slot axis.

    Implementation: one multi-operand ``lax.sort`` carrying the payload
    columns with the key — cheaper than argsort + gathers on TPU.
    """
    ids = cell_ids(sp, geom)
    tie = jnp.arange(ids.shape[0], dtype=jnp.int32)  # stability
    cols = jax.lax.sort(
        (ids, tie,
         sp.r[:, 0], sp.r[:, 1], sp.r[:, 2],
         sp.p[:, 0], sp.p[:, 1], sp.p[:, 2],
         sp.alive),
        num_keys=2,
    )
    r = jnp.stack(cols[2:5], axis=1)
    p = jnp.stack(cols[5:8], axis=1)
    return ParticleArrays(r=r, p=p, alive=cols[8])


sort_by_cell = partial(jax.jit, static_argnames=("geom",),
                       donate_argnums=(0,))(sort_by_cell_impl)


def apply_boundaries(sp: ParticleArrays, geom: Geometry) -> ParticleArrays:
    """Apply global coordinate boundaries to all particles.

    Periodic axes wrap by one period (``g_bound_periodic``,
    src/interfaces/point.cpp:19-26).  Reflective axes clamp the
    coordinate to the wall and flip that momentum component
    (``g_bound_reflective``, point.cpp:3-17).  On the remaining kinds
    the reference's ``update_cells`` silently erases particles that
    leave the domain (src/interfaces/particles.cpp:100-105); here they
    are marked dead, which conserves the array shape.
    """
    L = jnp.asarray(geom.L, dtype=sp.r.dtype)
    r = sp.r
    per = jnp.asarray([b == PERIODIC for b in geom.bounds])
    refl = jnp.asarray([b == REFLECTIVE for b in geom.bounds])

    # Single-pass wrap (reference adds/subtracts one period,
    # point.cpp:19-25); clip guards roundoff at the edges.
    r_wrapped = jnp.where(r < 0.0, r + L, jnp.where(r > L, r - L, r))
    r_wrapped = jnp.clip(r_wrapped, 0.0, L)

    out = (r < 0.0) | (r > L)
    r_new = jnp.where(per[None, :], r_wrapped, jnp.clip(r, 0.0, L))
    p_new = jnp.where(refl[None, :] & out, -sp.p, sp.p)
    dead = jnp.any(out & ~per[None, :] & ~refl[None, :], axis=1)
    alive = sp.alive & ~dead
    return ParticleArrays(r=r_new, p=p_new, alive=alive)


def kinetic_energy(sp: ParticleArrays, params: SortParameters) -> jax.Array:
    """Total kinetic energy 0.5 * m * mpw * sum p^2
    (reference: Energy::get_kinetic, src/diagnostics/energy.cpp:215-218)."""
    w = jnp.where(sp.alive, jnp.sum(sp.p * sp.p, axis=1), 0.0)
    return 0.5 * params.m * params.n_Np * jnp.sum(w)
