"""Device mesh and sharding layout for the PIC state.

The reference's only distribution strategy is 3-D spatial domain
decomposition over MPI ranks with halo exchange (src/utils/world.cpp:36-46,
SURVEY 2.7).  The TPU-native equivalent: a GSPMD mesh with the grid
sharded along z (optionally z and y), and particle arrays sharded along
their flat axis.  All kernels in this package are written in global
semantics (rolls + dense per-cell ops), so XLA inserts the halo
collective-permutes and the segment reductions become psums — the same
code runs on 1 chip or a pod slice.

Because the particle arrays are kept *cell-sorted* and the flat cell
index is z-major, sharding particles equally along their flat axis is
approximately aligned with the z-sharded grid — most gather/deposit
traffic stays chip-local, with XLA moving only the misaligned tail.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=("z",))


def field_sharding(mesh: Mesh) -> NamedSharding:
    """[3, nz, ny, nx] fields: shard the z axis."""
    return NamedSharding(mesh, P(None, "z", None, None))


def scalar_field_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("z", None, None))


def particle_sharding(mesh: Mesh) -> NamedSharding:
    """[N, 3] / [N] particle arrays: shard the particle axis."""
    return NamedSharding(mesh, P("z"))


def cellblock_sharding(mesh: Mesh) -> NamedSharding:
    """[G, ...] per-cell arrays (flat cell axis is z-major)."""
    return NamedSharding(mesh, P("z"))


def shard_fields(mesh: Mesh, *fields):
    s = field_sharding(mesh)
    out = tuple(jax.device_put(f, s) for f in fields)
    return out if len(out) > 1 else out[0]


def shard_particles(mesh: Mesh, sp):
    from ..particles import ParticleArrays

    s = particle_sharding(mesh)
    return ParticleArrays(
        r=jax.device_put(sp.r, s),
        p=jax.device_put(sp.p, s),
        alive=jax.device_put(sp.alive, s),
    )
