"""Fused in-VMEM Chebyshev preconditioner (Pallas).

The advance-phase preconditioner applies a degree-12 Chebyshev
semi-iteration of matM = (2+c) I + beta curl- curl+ per GMRES iteration
(solvers/spectral.py).  As XLA ops each of the ~13 curl-curl
applications per iteration is 12 shifted-array reads of the [3, nz, ny,
nx] field — dozens of separate small HLO ops whose fixed overheads
dominate at production grid sizes (the whole field is ~1.5 MB at 32^3,
far below the 16 MB VMEM).  This kernel runs the ENTIRE Chebyshev
recurrence in one Pallas dispatch with every operand resident in VMEM:

* layout [3, nz, ny*nx]: x is the fast lane axis, so an x-shift is a
  lane roll with a two-roll periodic edge fix (lane%nx == edge), a
  y-shift is a global lane roll by nx (the row wrap IS the periodic y
  wrap within one z-plane), and a z-shift is a sublane roll;
* non-periodic axes zero-fill the out-of-domain reads, matching
  ops/stencil.shift;
* the degree loop is fully unrolled (static), so Mosaic keeps x, r, d
  live in VMEM across all iterations — no HBM round-trips.

The reference leans on PETSc ILU for the same solve
(src/impls/ecsim/simulation.cpp:555-566); the Chebyshev redesign is
documented in solvers/spectral.py.  Eligibility (f32, single device, no
mesh, lane-tileable shape) is checked by :func:`cheb_pallas_ok`; under
a device mesh the XLA form is kept so GSPMD turns the shifts into halo
collectives.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import PERIODIC, Geometry

# VMEM budget for one field buffer: the recurrence keeps ~6 field-sized
# values live (x, r, d, rhs + curl temporaries), so cap a buffer at
# 2 MB (grid <= ~52^3) and leave headroom for Mosaic's spills.
_MAX_FIELD_BYTES = 2 << 20


def cheb_pallas_ok(geom: Geometry, dtype) -> bool:
    """Shape/dtype eligibility for the fused kernel (the caller gates
    on mesh/device-count separately)."""
    return (
        dtype == jnp.float32
        and (geom.ny * geom.nx) % 128 == 0
        and geom.nz % 8 == 0
        and 3 * geom.n_cells * 4 <= _MAX_FIELD_BYTES
    )


def _make_shift(nz: int, ny: int, nx: int, bounds):
    """In-VMEM shift: result[i] = f[i + by] along grid axis
    (0=x, 1=y, 2=z) of a [nz, ny*nx] component — the kernel-resident
    twin of ops/stencil.shift."""
    NYX = ny * nx
    periodic = [b == PERIODIC for b in bounds]

    def sh(c, axis: int, by: int):
        if axis == 0:  # x: lane roll with an edge fix at the x seam
            lane = jax.lax.broadcasted_iota(jnp.int32, (nz, NYX), 1)
            if by == 1:
                main = pltpu.roll(c, NYX - 1, axis=1)
                edge = (lane % nx) == nx - 1
                fix_s = nx - 1
            else:
                main = pltpu.roll(c, 1, axis=1)
                edge = (lane % nx) == 0
                fix_s = NYX - (nx - 1)
            if periodic[0]:
                fix = pltpu.roll(c, fix_s, axis=1)
                return jnp.where(edge, fix, main)
            return jnp.where(edge, 0.0, main)
        if axis == 1:  # y: lane roll by nx (row wrap == periodic y)
            main = pltpu.roll(c, (NYX - by * nx) % NYX, axis=1)
            if periodic[1]:
                return main
            lane = jax.lax.broadcasted_iota(jnp.int32, (nz, NYX), 1)
            edge = lane >= NYX - nx if by == 1 else lane < nx
            return jnp.where(edge, 0.0, main)
        # z: sublane roll
        main = pltpu.roll(c, (nz - by) % nz, axis=0)
        if periodic[2]:
            return main
        row = jax.lax.broadcasted_iota(jnp.int32, (nz, NYX), 0)
        edge = row == (nz - 1 if by == 1 else 0)
        return jnp.where(edge, 0.0, main)

    return sh


def _make_curls(geom: Geometry):
    sh = _make_shift(geom.nz, geom.ny, geom.nx, geom.bounds)
    ix, iy, iz = (1.0 / geom.dx, 1.0 / geom.dy, 1.0 / geom.dz)

    def curlp(F):
        Fx, Fy, Fz = F
        return (
            (sh(Fz, 1, +1) - Fz) * iy - (sh(Fy, 2, +1) - Fy) * iz,
            (sh(Fx, 2, +1) - Fx) * iz - (sh(Fz, 0, +1) - Fz) * ix,
            (sh(Fy, 0, +1) - Fy) * ix - (sh(Fx, 1, +1) - Fx) * iy,
        )

    def curlm(F):
        Fx, Fy, Fz = F
        return (
            (Fz - sh(Fz, 1, -1)) * iy - (Fy - sh(Fy, 2, -1)) * iz,
            (Fx - sh(Fx, 2, -1)) * iz - (Fz - sh(Fz, 0, -1)) * ix,
            (Fy - sh(Fy, 0, -1)) * ix - (Fx - sh(Fx, 1, -1)) * iy,
        )

    return curlp, curlm


def _cheb_kernel(rhs_ref, shift_ref, out_ref, *, geom: Geometry,
                 degree: int, dt: float):
    """Chebyshev semi-iteration x ~ (matM + shift I)^{-1} rhs, degree
    iterations fully unrolled (the exact recurrence of
    solvers/spectral.py:159-187)."""
    curlp, curlm = _make_curls(geom)
    beta = 0.5 * dt * dt
    lam_cc = 4.0 * (1.0 / geom.dx**2 + 1.0 / geom.dy**2
                    + 1.0 / geom.dz**2)
    shift = shift_ref[0, 0]
    a = 2.0 + shift
    b = a + beta * lam_cc
    theta = 0.5 * (b + a)
    delta = 0.5 * (b - a)
    sigma1 = theta / delta

    def Mv(F):
        cc = curlm(curlp(F))
        return tuple(a * F[c] + beta * cc[c] for c in range(3))

    rhs = tuple(rhs_ref[c] for c in range(3))
    x0 = tuple(jnp.zeros_like(rhs[c]) for c in range(3))
    inv_theta = 1.0 / theta
    d0 = tuple(rhs[c] * inv_theta for c in range(3))
    rho0 = jnp.float32(1.0) / sigma1

    # fori_loop (not Python unrolling): a 12x-unrolled chain of ~30 ops
    # per iteration overflows Mosaic's recursive lowering and bloats
    # compile time; the loop-carried form keeps the kernel graph flat.
    def body(_, state):
        x, r, d, rho = state
        x = tuple(x[c] + d[c] for c in range(3))
        Md = Mv(d)
        r = tuple(r[c] - Md[c] for c in range(3))
        rho_new = 1.0 / (2.0 * sigma1 - rho)
        cd = rho_new * rho
        cr = 2.0 * rho_new / delta
        d = tuple(cd * d[c] + cr * r[c] for c in range(3))
        return (x, r, d, rho_new)

    x, _r, _d, _rho = jax.lax.fori_loop(
        0, degree, body, (x0, rhs, d0, rho0))
    for c in range(3):
        out_ref[c] = x[c]


@functools.partial(jax.jit, static_argnames=("geom", "degree", "dt",
                                             "interpret"))
def cheb_matM_inv_pallas(rhs, shift, *, geom: Geometry, degree: int,
                         dt: float, interpret: bool = False):
    """x ~ (matM + shift I)^{-1} rhs in ONE dispatch (see module doc).

    ``rhs`` is [3, nz, ny, nx] float32; ``shift`` a scalar (traced)."""
    import sys

    # The Mosaic lowering of the stencil recurrence recurses deeply in
    # jax's nested-structure walkers; the default 1000-frame limit
    # overflows on this toolchain even with the loop-carried form.
    if sys.getrecursionlimit() < 20000:
        sys.setrecursionlimit(20000)
    nz, ny, nx = geom.nz, geom.ny, geom.nx
    NYX = ny * nx
    F = rhs.reshape(3, nz, NYX)
    sh = jnp.asarray(shift, rhs.dtype).reshape(1, 1)
    kernel = functools.partial(_cheb_kernel, geom=geom, degree=degree,
                               dt=dt)
    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, nz, NYX), rhs.dtype),
        cost_estimate=pl.CostEstimate(
            flops=degree * 3 * nz * NYX * 40,
            bytes_accessed=2 * 3 * nz * NYX * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(F, sh)
    return out.reshape(rhs.shape)
