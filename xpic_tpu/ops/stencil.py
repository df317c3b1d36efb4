"""Yee-lattice differential operators as stencil ops.

The reference assembles curl/divergence/gradient as distributed sparse
matrices via COO (src/utils/operators.cpp:99-214).  On TPU the same
operators are 4-point stencils; expressing them as shifted-array
arithmetic lets XLA fuse them into surrounding elementwise work and,
under GSPMD sharding, turn the shifts into halo collective-permutes.
The sign/shift conventions reproduce ``Rotor::fill_stencil``
(src/utils/operators.cpp:155-214):

* positive (forward) shifts — the ``rotE`` operator acting on the
  edge-centered electric field, producing face-centered values;
* negative (backward) shifts — the ``rotB`` operator acting on the
  face-centered magnetic field.

Field arrays are ``[3, nz, ny, nx]`` with components (x, y, z) leading
and x fastest-varying (lane dimension on TPU).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import PERIODIC

def shift(f: jnp.ndarray, axis: str, by: int, bound: str = PERIODIC) -> jnp.ndarray:
    """Return ``f`` shifted so that result[i] = f[i + by] along ``axis``.

    ``f``'s trailing axes are (z, y, x); works for [nz, ny, nx]
    components and [3, nz, ny, nx] fields alike.  Periodic boundaries
    wrap (as the PETSc DMDA does internally for DM_BOUNDARY_PERIODIC,
    src/utils/operators.cpp:118); other boundary kinds read zeros
    outside the domain (matching the reference's remap_stencil dropping
    out-of-range entries, operators.cpp:27-43).
    """
    ax = f.ndim - 1 - "xyz".index(axis)
    if bound == PERIODIC:
        return jnp.roll(f, -by, axis=ax)
    if by == 0:
        return f
    pad = [(0, 0)] * f.ndim
    if by > 0:
        pad[ax] = (0, by)
        sl = [slice(None)] * f.ndim
        sl[ax] = slice(by, None)
    else:
        pad[ax] = (-by, 0)
        sl = [slice(None)] * f.ndim
        sl[ax] = slice(None, by)
    return jnp.pad(f, pad)[tuple(sl)]


def _d_plus(f, axis, step, bounds):
    b = bounds["xyz".index(axis)]
    return (shift(f, axis, +1, b) - f) / step


def _d_minus(f, axis, step, bounds):
    b = bounds["xyz".index(axis)]
    return (f - shift(f, axis, -1, b)) / step


def curl_positive(F, steps, bounds=(PERIODIC,) * 3):
    """Forward-difference curl (``Rotor::create_positive`` / rotE).

    Maps edge-centered (electric-like) fields to face-centered
    (magnetic-like) fields on the Yee lattice.
    """
    dx, dy, dz = steps
    Fx, Fy, Fz = F[0], F[1], F[2]
    cx = _d_plus(Fz, "y", dy, bounds) - _d_plus(Fy, "z", dz, bounds)
    cy = _d_plus(Fx, "z", dz, bounds) - _d_plus(Fz, "x", dx, bounds)
    cz = _d_plus(Fy, "x", dx, bounds) - _d_plus(Fx, "y", dy, bounds)
    return jnp.stack([cx, cy, cz])


def curl_negative(F, steps, bounds=(PERIODIC,) * 3):
    """Backward-difference curl (``Rotor::create_negative`` / rotB).

    Maps face-centered (magnetic-like) fields to edge-centered
    (electric-like) fields on the Yee lattice.
    """
    dx, dy, dz = steps
    Fx, Fy, Fz = F[0], F[1], F[2]
    cx = _d_minus(Fz, "y", dy, bounds) - _d_minus(Fy, "z", dz, bounds)
    cy = _d_minus(Fx, "z", dz, bounds) - _d_minus(Fz, "x", dx, bounds)
    cz = _d_minus(Fy, "x", dx, bounds) - _d_minus(Fx, "y", dy, bounds)
    return jnp.stack([cx, cy, cz])


def divergence_negative(F, steps, bounds=(PERIODIC,) * 3):
    """Backward-difference divergence: 3-dof field -> node scalar.

    Counterpart of ``Divergence::create_negative`` (src/utils/operators.h:101-110)
    used by the charge-conservation diagnostic
    (src/diagnostics/charge_conservation.cpp:125-171): for edge-centered
    J, div J lands on lattice nodes.
    """
    dx, dy, dz = steps
    return (
        _d_minus(F[0], "x", dx, bounds)
        + _d_minus(F[1], "y", dy, bounds)
        + _d_minus(F[2], "z", dz, bounds)
    )


def divergence_positive(F, steps, bounds=(PERIODIC,) * 3):
    dx, dy, dz = steps
    return (
        _d_plus(F[0], "x", dx, bounds)
        + _d_plus(F[1], "y", dy, bounds)
        + _d_plus(F[2], "z", dz, bounds)
    )


def gradient_positive(f, steps, bounds=(PERIODIC,) * 3):
    """Forward-difference gradient: node scalar -> edge-centered 3-dof field
    (counterpart of ``Gradient``, src/utils/operators.h:112-119)."""
    dx, dy, dz = steps
    return jnp.stack(
        [
            _d_plus(f, "x", dx, bounds),
            _d_plus(f, "y", dy, bounds),
            _d_plus(f, "z", dz, bounds),
        ]
    )


def gradient_negative(f, steps, bounds=(PERIODIC,) * 3):
    dx, dy, dz = steps
    return jnp.stack(
        [
            _d_minus(f, "x", dx, bounds),
            _d_minus(f, "y", dy, bounds),
            _d_minus(f, "z", dz, bounds),
        ]
    )
