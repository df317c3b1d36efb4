"""Implicit (time-averaged) Esirkepov gather/deposit for eccapfim.

Reference: src/algorithms/implicit_esirkepov.cpp.  For a straight move
r0 -> rn, the electric field is gathered (and the current deposited)
with mixed-order weights per component cx, with cyclic transverse axes
cy = cx+1, cz = cx+2 (mod 3):

    w = (1/6) S1(g_stag - prh)[cx]
        * ( S2(g - prn)[cy] (2 S2(g - prn)[cz] + S2(g - pr0)[cz])
          + S2(g - pr0)[cy] (2 S2(g - pr0)[cz] + S2(g - prn)[cz]) )

where prh = (prn + pr0)/2 and g_stag = g + 1/2.  The magnetic field is
gathered with plain order-2 Yee (magnetic) products at prh.

TPU layout: per SNES residual evaluation the fields are pre-gathered
into per-cell window blocks ``[G, 3, 6, 6, 6]`` (offsets -2..+3 from the
cell, axes (z, y, x)), once; every Picard iteration then contracts
per-axis weight vectors against the blocks with einsums — no rolled
grids inside the iteration loop.  Valid while positions stay within one
cell of the particle's binned cell (the reference instead re-anchors
per call, implicit_esirkepov.cpp:27-45; eccapfim's cell-crossing
sub-stepping keeps per-segment moves below one cell anyway).

The path split at (node-centred) cell faces replaces
``cell_traversal`` (src/impls/eccapfim/cell_traversal.cpp:3-77): with
per-axis displacement below one cell there is at most one face crossing
per axis, so the crossing parameters sort into at most 4 segments —
a fixed, vectorizable shape.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import Geometry
from .gather_scatter import rolled_flat
from .splines import spline_1, spline_2

WIDTH = 6
ANCHOR = -2
MAXSEG = 4


def gather_window_blocks(F, geom: Geometry):
    """Pre-gather per-cell windows: out[G, 3, 6, 6, 6] with axes
    (component, dz, dy, dx), offsets ANCHOR..ANCHOR+5 from the cell."""
    comps = []
    for c in range(3):
        planes = []
        for oz in range(WIDTH):
            rows = []
            for oy in range(WIDTH):
                cols = [
                    rolled_flat(F[c], (ANCHOR + oz, ANCHOR + oy, ANCHOR + ox),
                                geom.bounds)
                    for ox in range(WIDTH)
                ]
                rows.append(jnp.stack(cols, axis=-1))
            planes.append(jnp.stack(rows, axis=-2))
        comps.append(jnp.stack(planes, axis=-3))
    return jnp.stack(comps, axis=1)  # [G, 3, 6, 6, 6]


def _offsets(dtype):
    return jnp.arange(WIDTH, dtype=dtype) + ANCHOR


def node_weights_s2(t):
    """S2(t - o) over the 6-offset window; t is cell-relative [G, K]."""
    return spline_2(t[..., None] - _offsets(t.dtype))


def stag_weights_s1(t):
    """S1(t - (o + 1/2)) over the window (hat at half-shifted points)."""
    return spline_1(t[..., None] - (_offsets(t.dtype) + 0.5))


def stag_weights_s2(t):
    return spline_2(t[..., None] - (_offsets(t.dtype) + 0.5))


def _axis_weights_E(t0, tn):
    """Per-axis weight factors for the implicit-Esirkepov E kernel.

    Returns, per spatial axis a: (sh[a], sn[a], s0[a]) each [G, K, 6],
    where sh is the (1/6)-scaled hat at staggered points of the
    *midpoint*, and sn/s0 the order-2 node weights of the new/old
    positions (implicit_esirkepov.cpp:31-66).
    """
    th = 0.5 * (t0 + tn)
    sh = [stag_weights_s1(th[..., a]) / 6.0 for a in range(3)]
    sn = [node_weights_s2(tn[..., a]) for a in range(3)]
    s0 = [node_weights_s2(t0[..., a]) for a in range(3)]
    return sh, sn, s0


def _component_weights(cx, sh, sn, s0):
    """w_cx[axis] triple (wx, wy, wz) with the cyclic pairing
    cy = cx+1, cz = cx+2 — returns the three [G, K, 6] factors for the
    separable part, plus the paired (cy, cz) combination which is a sum
    of two separable terms."""
    cy = (cx + 1) % 3
    cz = (cx + 2) % 3
    # combination: sn_y (2 sn_z + s0_z) + s0_y (2 s0_z + sn_z)
    A = 2.0 * sn[cz] + s0[cz]
    Bc = 2.0 * s0[cz] + sn[cz]
    return cy, cz, sh[cx], (sn[cy], A), (s0[cy], Bc)


def _contract(block_c, wmap):
    """einsum of per-axis [G,K,6] weights against [G,6,6,6] (z,y,x)."""
    wx, wy, wz = wmap
    return jnp.einsum("gkz,gky,gkx,gzyx->gk", wz, wy, wx, block_c,
                      precision="high")


def _axis_map(cx, cy, cz, w_cx, w_cy, w_cz):
    out = [None, None, None]
    out[cx] = w_cx
    out[cy] = w_cy
    out[cz] = w_cz
    return tuple(out)  # (wx, wy, wz)


def gather_E_implicit(Eblk, t0, tn):
    """E_p[G, K, 3] for the move t0 -> tn against pre-gathered blocks."""
    sh, sn, s0 = _axis_weights_E(t0, tn)
    comps = []
    for cx in range(3):
        cy, cz, w_sh, (sny, A), (s0y, Bc) = _component_weights(cx, sh, sn, s0)
        block = Eblk[:, cx]
        term1 = _contract(block, _axis_map(cx, cy, cz, w_sh, sny, A))
        term2 = _contract(block, _axis_map(cx, cy, cz, w_sh, s0y, Bc))
        comps.append(term1 + term2)
    return jnp.stack(comps, axis=-1)


def deposit_J_implicit(t0, tn, v, scale):
    """Per-cell current window blocks Jblk[G, 3, 6, 6, 6] for the move
    t0 -> tn carrying velocity v, scaled by ``scale`` [G, K]
    (implicit_esirkepov.cpp:95-117, the adjoint of gather_E_implicit)."""
    sh, sn, s0 = _axis_weights_E(t0, tn)
    comps = []
    for cx in range(3):
        cy, cz, w_sh, (sny, A), (s0y, Bc) = _component_weights(cx, sh, sn, s0)
        val = scale * v[..., cx]  # [G, K]
        blocks = []
        for (wy_, wz_) in ((sny, A), (s0y, Bc)):
            wmap = _axis_map(cx, cy, cz, w_sh, wy_, wz_)
            wx, wy, wz = wmap
            blocks.append(
                jnp.einsum("gk,gkz,gky,gkx->gzyx", val, wz, wy, wx,
                           precision="high")
            )
        comps.append(blocks[0] + blocks[1])
    return jnp.stack(comps, axis=1)


def scatter_blocks(Jblk, geom: Geometry):
    """Scatter per-cell window blocks onto the grid: [3, nz, ny, nx]."""
    from .gather_scatter import blocks_to_grid

    return blocks_to_grid(Jblk, geom, WIDTH, ANCHOR)


def gather_B_implicit(Bblk, th):
    """B_p[G, K, 3]: plain order-2 magnetic Yee products at the midpoint
    ``th`` (cell-relative), against pre-gathered blocks
    (implicit_esirkepov.cpp:70-76 via SimpleInterpolation)."""
    wn = [node_weights_s2(th[..., a]) for a in range(3)]
    ws = [stag_weights_s2(th[..., a]) for a in range(3)]
    # B staggering: component X -> (node x, stag y, stag z) etc.
    maps = (
        (wn[0], ws[1], ws[2]),
        (ws[0], wn[1], ws[2]),
        (ws[0], ws[1], wn[2]),
    )
    comps = [_contract(Bblk[:, c], maps[c]) for c in range(3)]
    return jnp.stack(comps, axis=-1)


def gather_dk_fields(Eblk, Bblk, gradBblk, t0, tn):
    """Drift-kinetic variant (reference: src/algorithms/drift_kinetic_implicit.cpp):
    path-averaged E via the implicit-Esirkepov kernel plus B and a
    precomputed |B|-gradient field gathered with magnetic staggering at
    the new position ``tn``."""
    E_p = gather_E_implicit(Eblk, t0, tn)
    B_p = gather_B_implicit(Bblk, tn)
    gradB_p = gather_B_implicit(gradBblk, tn)
    return E_p, B_p, gradB_p


def split_segments(t0, tn):
    """Split the straight move t0 -> tn (cell-relative, grid units) at
    node-cell faces (half-integer planes).

    Returns taus[G, K, MAXSEG+1] with taus[..., 0] = 0, taus[..., -1] = 1
    and the (sorted, clipped) face-crossing parameters in between.
    Degenerate segments have zero length and deposit nothing.
    """
    d = tn - t0
    curr = jnp.round(t0)
    last = jnp.round(tn)
    sign = jnp.where(d > 0, 1.0, -1.0)
    bnd = curr + 0.5 * sign
    safe_d = jnp.where(d == 0, 1.0, d)
    tc = jnp.where(
        (curr != last) & (d != 0), (bnd - t0) / safe_d, 2.0
    )  # [G, K, 3]; 2.0 = "no crossing"
    tc = jnp.clip(tc, 0.0, 1.0 + 1e-30)
    tc = jnp.where(tc > 1.0, 1.0, tc)
    ts = jnp.sort(tc, axis=-1)
    zero = jnp.zeros_like(ts[..., :1])
    one = jnp.ones_like(ts[..., :1])
    return jnp.concatenate([zero, ts, one], axis=-1)  # [G, K, 5]
