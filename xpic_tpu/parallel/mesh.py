"""Device mesh and sharding layout for the PIC state.

The reference's only distribution strategy is 3-D spatial domain
decomposition over MPI ranks with halo exchange (src/utils/world.cpp:36-46,
SURVEY 2.7), with per-axis processor counts selectable on the command
line (``-da_processors_{x,y,z}``, src/utils/configuration.cpp:117-130).
The TPU-native equivalent: a GSPMD mesh with the grid sharded along z
(1-D), z and y (2-D), or all of z, y, x (3-D), and particle arrays
sharded along their flat axis.  All kernels in this package are
written in global semantics (rolls + dense per-cell ops), so XLA
inserts the halo collective-permutes and the segment reductions become
psums — the same code runs on 1 chip or a pod slice.

Mesh shapes come from the ``"Mesh"`` config key: an integer N is a 1-D
z mesh over N devices; a mapping ``{"z": 2, "y": 2, "x": 2}`` is the
per-axis-processor-count analog (any subset of axes).

Because the particle arrays are kept *cell-sorted* and the flat cell
index is z-major, sharding particles equally along their flat axis is
approximately aligned with the z-sharded grid — most gather/deposit
traffic stays chip-local, with XLA moving only the misaligned tail.
Under a 2-D mesh the flat cell axis is sharded over both mesh axes
(``P(("z", "y"))``): contiguous flat blocks still align with the grid's
z-blocks whenever nz/Dz is divisible by Dy; the y-halo traffic is the
price of the extra decomposition axis, exactly as in the reference's
2-D DMDA splits.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: int | tuple[int, ...] | None = None,
              devices=None) -> Mesh:
    """Build the device mesh.

    ``shape`` is either a device count (1-D ``("z",)`` mesh), a tuple
    ``(Dz, Dy)`` (2-D ``("z", "y")`` mesh) or ``(Dz, Dy, Dx)`` (the
    full 3-axis decomposition) — the analog of ``-da_processors_z/y/x``
    (src/utils/configuration.cpp:117-130).
    """
    if isinstance(shape, tuple) and len(shape) == 1:
        shape = shape[0]
    if devices is None:
        devices = jax.devices()
    if isinstance(shape, tuple):
        n = 1
        for d in shape:
            n *= d
        if len(devices) < n:
            raise RuntimeError(
                f"mesh shape {shape} needs {n} devices, "
                f"only {len(devices)} available"
            )
        return Mesh(
            np.asarray(devices[:n]).reshape(shape),
            axis_names=("z", "y", "x")[: len(shape)],
        )
    n = len(devices) if shape is None else shape
    return Mesh(np.asarray(devices[:n]), axis_names=("z",))


def _cell_axes(mesh: Mesh):
    """Spec entry for the flat (z-major) cell axis."""
    return tuple(mesh.axis_names) if len(mesh.axis_names) > 1 else "z"


def _grid_spec(mesh: Mesh):
    """Per-axis spec entries for a [nz, ny, nx] grid."""
    return tuple(a if a in mesh.axis_names else None
                 for a in ("z", "y", "x"))


def field_sharding(mesh: Mesh) -> NamedSharding:
    """[3, nz, ny, nx] fields: shard z (plus y / x on 2-D / 3-D
    meshes)."""
    return NamedSharding(mesh, P(None, *_grid_spec(mesh)))


def scalar_field_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(*_grid_spec(mesh)))


def particle_sharding(mesh: Mesh) -> NamedSharding:
    """[N, 3] / [N] particle arrays: shard the particle axis."""
    return NamedSharding(mesh, P(_cell_axes(mesh)))


def cellblock_sharding(mesh: Mesh) -> NamedSharding:
    """[G, ...] per-cell arrays (flat cell axis is z-major)."""
    return NamedSharding(mesh, P(_cell_axes(mesh)))


def state_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """BinnedState leaves: [G, K] (ndim=2) or [G, K, 3] (ndim=3)."""
    spec = (_cell_axes(mesh),) + (None,) * (ndim - 1)
    return NamedSharding(mesh, P(*spec))


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
