"""Scatter-free spline gather/deposit kernels over the binned layout.

Design
------
Every interpolation/deposition in the reference walks a per-particle
stencil window and reads/atomically-writes grid memory
(src/algorithms/simple_interpolation.cpp:8-39,
src/algorithms/esirkepov_decomposition.cpp:20-103,
src/impls/ecsim/simulation.cpp:8-118).  Here all windows are anchored at
the particle's *cell*, which makes the window offsets uniform across the
whole grid.  A gather/deposit then becomes an unrolled loop over the
``width^3`` offsets where each iteration touches:

* one shifted copy of the grid array (``jnp.roll`` — under GSPMD this is
  a halo collective-permute), reshaped to the flat cell axis ``[G]``;
* the ``[G, K]`` per-slot weight product (separable per axis).

No scatter instruction is ever issued for deposits — per-cell sums over
the slot axis replace the reference's OpenMP atomics, and the result is
bitwise deterministic for a fixed particle order.

Anchors (offsets from the cell index ``c = floor(r/d)``), derived from
the reference's window rules (src/utils/shape.cpp:12-29):

* order-2 single position (``Shape::setup(r)``): anchor -1, width 4 —
  covers both node and half-shifted (Yee) weights;
* order-2 position pair (Esirkepov, ``Shape::setup(old,new)``):
  anchor -2, width 6 — covers displacements up to one cell;
* order-1 (ECSIM s1 gathers): anchor -1, width 3.

Weights are plain spline evaluations; e.g. the hand-unrolled linear
staggered weights of ``interpolate_E_s1`` (src/impls/ecsim/simulation.cpp:8-64)
are exactly ``spline_1(r/d - 0.5 - (c + anchor + o))``.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp

from ..config import Geometry, PERIODIC
from .splines import spline

# Yee staggering tables: entry [c][axis] == 1 if component c is shifted
# half a step along that axis. Electric components are shifted along
# their own axis, magnetic along the two transverse axes
# (reference: Shape::electric/magnetic, src/utils/shape.h:54-72).
E_STAGGER = ((1, 0, 0), (0, 1, 0), (0, 0, 1))
B_STAGGER = ((0, 1, 1), (1, 0, 1), (1, 1, 0))
# Node-centered (all weights from unshifted splines), e.g. density moments.
N_STAGGER = ((0, 0, 0), (0, 0, 0), (0, 0, 0))


@lru_cache(maxsize=None)
def _cell_coords_cached(nx: int, ny: int, nz: int):
    import numpy as np

    g = np.arange(nx * ny * nz, dtype=np.int32)
    cx = g % nx
    cy = (g // nx) % ny
    cz = g // (nx * ny)
    return cx, cy, cz


def cell_t(geom: Geometry, rg: jnp.ndarray) -> jnp.ndarray:
    """Per-axis position of each slot relative to its cell index.

    ``rg`` is the binned [G, K, 3] position in grid units; returns
    t[G, K, 3] = rg - cell, i.e. the fractional position in [0, 1).
    """
    cx, cy, cz = _cell_coords_cached(geom.nx, geom.ny, geom.nz)
    cell = jnp.stack(
        [jnp.asarray(cx), jnp.asarray(cy), jnp.asarray(cz)], axis=-1
    ).astype(rg.dtype)[:, None, :]
    return rg - cell


def axis_weights(t: jnp.ndarray, order: int, width: int, anchor: int,
                 stag: bool) -> jnp.ndarray:
    """Spline weights [..., width] at window offsets ``anchor..anchor+width-1``.

    ``t`` is the position relative to the cell index along one axis;
    weight o = S_order(t - (anchor + o) - 0.5*stag).
    """
    sf = spline(order)
    offs = jnp.arange(width, dtype=t.dtype) + (anchor + (0.5 if stag else 0.0))
    return sf(t[..., None] - offs)


def rolled_flat(field: jnp.ndarray, off: tuple[int, int, int],
                bounds: tuple[str, str, str]) -> jnp.ndarray:
    """The grid array sampled at cell+off, flattened to [G].

    ``field`` is [nz, ny, nx]; ``off`` is (oz, oy, ox).  Periodic axes
    wrap; other boundary kinds read zeros outside the domain.
    """
    oz, oy, ox = off
    out = field
    for ax, (o, b) in enumerate(zip((oz, oy, ox), (bounds[2], bounds[1], bounds[0]))):
        if o == 0:
            continue
        if b == PERIODIC:
            out = jnp.roll(out, -o, axis=ax)
        else:
            pad = [(0, 0)] * 3
            sl = [slice(None)] * 3
            if o > 0:
                pad[ax] = (0, o)
                sl[ax] = slice(o, None)
            else:
                pad[ax] = (-o, 0)
                sl[ax] = slice(None, o)
            out = jnp.pad(out, pad)[tuple(sl)]
    return out.reshape(-1)


def _component_axis_weights(t, order, width, anchor, stag_row):
    sx, sy, sz = stag_row
    wx = axis_weights(t[..., 0], order, width, anchor, bool(sx))
    wy = axis_weights(t[..., 1], order, width, anchor, bool(sy))
    wz = axis_weights(t[..., 2], order, width, anchor, bool(sz))
    return wx, wy, wz


def gather_vector(F, t, valid, geom: Geometry, *, order: int, width: int,
                  anchor: int, stagger=E_STAGGER) -> jnp.ndarray:
    """Interpolate a staggered vector field to the binned slots.

    ``F`` is [3, nz, ny, nx]; returns [G, K, 3].  Counterpart of
    ``SimpleInterpolation::process`` (src/algorithms/simple_interpolation.cpp:8-39)
    for order 2 and of ``interpolate_E_s1``/``interpolate_B_s1`` for order 1.
    """
    out = []
    for c in range(3):
        wx, wy, wz = _component_axis_weights(t, order, width, anchor, stagger[c])
        acc = jnp.zeros(t.shape[:-1], dtype=F.dtype)
        for oz in range(width):
            for oy in range(width):
                wzy = wz[..., oz] * wy[..., oy]
                for ox in range(width):
                    f = rolled_flat(
                        F[c], (anchor + oz, anchor + oy, anchor + ox), geom.bounds
                    )
                    acc = acc + (wzy * wx[..., ox]) * f[:, None]
        out.append(acc)
    res = jnp.stack(out, axis=-1)
    return jnp.where(valid[..., None], res, 0.0)


def _unrolled_deposit(geom: Geometry, width, anchor, weight_fn):
    """Shared deposit loop: weight_fn(c, oz, oy, ox) -> [G, K] contribution.

    Returns the [3, nz, ny, nx] deposited field. The inverse of a rolled
    read at +off is a rolled write at -off.
    """
    shape = geom.shape
    comps = []
    for c in range(3):
        acc = None
        for oz in range(width):
            for oy in range(width):
                for ox in range(width):
                    w = weight_fn(c, oz, oy, ox)
                    dense = jnp.sum(w, axis=1).reshape(shape)
                    off = (anchor + oz, anchor + oy, anchor + ox)
                    contrib = _unroll_back(dense, off, geom.bounds)
                    acc = contrib if acc is None else acc + contrib
        comps.append(acc)
    return jnp.stack(comps)


def _unroll_back(dense, off, bounds):
    """Place per-cell sums at cell+off: the adjoint of :func:`rolled_flat`."""
    oz, oy, ox = off
    out = dense
    for ax, (o, b) in enumerate(zip((oz, oy, ox), (bounds[2], bounds[1], bounds[0]))):
        if o == 0:
            continue
        if b == PERIODIC:
            out = jnp.roll(out, +o, axis=ax)
        else:
            pad = [(0, 0)] * 3
            sl = [slice(None)] * 3
            if o > 0:
                pad[ax] = (o, 0)
                sl[ax] = slice(None, -o)
            else:
                pad[ax] = (0, -o)
                sl[ax] = slice(-o, None)
            out = jnp.pad(out, pad)[tuple(sl)]
    return out


def deposit_vector(values, t, valid, geom: Geometry, *, order: int, width: int,
                   anchor: int, stagger=E_STAGGER) -> jnp.ndarray:
    """Deposit per-slot vector values onto the staggered grid.

    ``values`` is [G, K, 3]; returns [3, nz, ny, nx].  Counterpart of
    ``SimpleDecomposition::process`` (src/algorithms/simple_decomposition.cpp:9-32)
    and of the ECSIM currI scatter (src/impls/ecsim/particles.cpp:127-133).
    """
    masked = jnp.where(valid[..., None], values, 0.0)
    w_cache = {}

    def weight_fn(c, oz, oy, ox):
        if c not in w_cache:
            w_cache[c] = _component_axis_weights(t, order, width, anchor, stagger[c])
        wx, wy, wz = w_cache[c]
        return masked[..., c] * (wz[..., oz] * wy[..., oy] * wx[..., ox])

    return _unrolled_deposit(geom, width, anchor, weight_fn)


def deposit_scalar(values, t, valid, geom: Geometry, *, order: int, width: int,
                   anchor: int, stag: bool = False) -> jnp.ndarray:
    """Deposit scalar values; returns [nz, ny, nx].

    Counterpart of the density gather in ``ParticlesChargeDensity::collect``
    (src/diagnostics/charge_conservation.cpp:63-101) when node-centered
    (``stag=False``), and of the cell-centered moment deposit of
    ``DistributionMoment::collect`` (src/diagnostics/
    distribution_moment.cpp:125-155) with ``stag=True`` (weights taken at
    the half-shifted lattice on every axis).
    """
    masked = jnp.where(valid, values, 0.0)
    wx = axis_weights(t[..., 0], order, width, anchor, stag)
    wy = axis_weights(t[..., 1], order, width, anchor, stag)
    wz = axis_weights(t[..., 2], order, width, anchor, stag)

    acc = None
    for oz in range(width):
        for oy in range(width):
            for ox in range(width):
                w = masked * (wz[..., oz] * wy[..., oy] * wx[..., ox])
                dense = jnp.sum(w, axis=1).reshape(geom.shape)
                contrib = _unroll_back(
                    dense, (anchor + oz, anchor + oy, anchor + ox), geom.bounds
                )
                acc = contrib if acc is None else acc + contrib
    return acc


def blocks_to_grid(blk, geom: Geometry, width: int, anchor: int):
    """Scatter per-cell window blocks ``[G, 3, w, w, w]`` (axes z, y, x,
    offsets anchor..anchor+w-1 from the cell) onto the grid:
    [3, nz, ny, nx].  The adjoint of ``width**3`` :func:`rolled_flat`
    reads; every summand is a whole-grid roll, no per-particle scatter."""
    comps = []
    for c in range(3):
        acc = None
        for oz in range(width):
            for oy in range(width):
                for ox in range(width):
                    dense = blk[:, c, oz, oy, ox].reshape(geom.shape)
                    contrib = _unroll_back(
                        dense, (anchor + oz, anchor + oy, anchor + ox),
                        geom.bounds,
                    )
                    acc = contrib if acc is None else acc + contrib
        comps.append(acc)
    return jnp.stack(comps)


def esirkepov_current(t_old, t_new, valid, alpha, geom: Geometry,
                      dtype=None) -> jnp.ndarray:
    """Charge-conserving Esirkepov current deposit.

    ``t_old``/``t_new`` are cell-relative positions [G, K, 3] before and
    after the move (binned by the *old* cell); ``alpha`` is the
    reference's prefactor q*n/Np / (6*dt) (src/impls/basic/particles.cpp:43).
    Returns the [3, nz, ny, nx] current increment.

    The per-axis running sums of the reference
    (esirkepov_decomposition.cpp:57-103) factorize: with
    ``CS_x[i] = cumsum_i(Sn_x - So_x)`` the Jx contribution at offset
    (i, j, k) is ``-alpha*dx * CS_x[i] * (Sn_y[j]*A_z[k] + So_y[j]*B_z[k])``
    where A = 2*Sn + So and B = 2*So + Sn, so each offset needs O(1)
    work per slot and the whole deposit stays scatter-free.

    MEASURED NEGATIVE (r5): rewriting the three components as six
    ``einsum("gk,gkz,gky,gkx->gzyx")`` block contractions (the
    deposit_J_implicit form) + blocks_to_grid ran the ecsimcorr bench
    at 549 ms/step vs 415 for this per-offset form — XLA fuses each
    offset term into one multiply-reduce kLoop with no materialized
    intermediate, while the einsum route writes+reads [G, K, 36]
    per contraction.
    """
    order, width, anchor = 2, 6, -2
    dt_ = t_old.dtype if dtype is None else dtype

    def axes_w(t):
        return [axis_weights(t[..., a], order, width, anchor, False) for a in range(3)]

    So = axes_w(t_old)
    Sn = axes_w(t_new)
    mask = valid.astype(dt_)

    CS = [jnp.cumsum(Sn[a] - So[a], axis=-1) for a in range(3)]
    A = [2.0 * Sn[a] + So[a] for a in range(3)]
    Bw = [2.0 * So[a] + Sn[a] for a in range(3)]

    dx, dy, dz = geom.dx, geom.dy, geom.dz
    qx = alpha * dx
    qy = alpha * dy
    qz = alpha * dz

    # Offset-component weight: component X sums over its own axis via CS_x
    # and couples (y, z) through the symmetric (A, B) combination.
    def weight_fn(c, oz, oy, ox):
        if c == 0:
            return (-qx * mask) * CS[0][..., ox] * (
                Sn[1][..., oy] * A[2][..., oz] + So[1][..., oy] * Bw[2][..., oz]
            )
        if c == 1:
            return (-qy * mask) * CS[1][..., oy] * (
                Sn[0][..., ox] * A[2][..., oz] + So[0][..., ox] * Bw[2][..., oz]
            )
        return (-qz * mask) * CS[2][..., oz] * (
            Sn[1][..., oy] * A[0][..., ox] + So[1][..., oy] * Bw[0][..., ox]
        )

    return _unrolled_deposit(geom, width, anchor, weight_fn)
