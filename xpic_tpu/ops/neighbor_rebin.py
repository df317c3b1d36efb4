"""Neighbor-exchange particle migration (the fast rebin).

The production regime both this framework and the reference target is
sub-cell motion per step (v dt < dx, the CFL guard logged at species
init, src/interfaces/simulation.tpp:68-77), so a migrating particle can
only move to one of its 27 neighbor cells.  The reference exploits
exactly this: ``update_cells_mpi`` exchanges points with the 26
neighbor ranks only (src/interfaces/particles.cpp:118-248).  The global
``[G*K]`` payload sort of :mod:`binning` handles arbitrary moves but
pays log^2(G*K) bitonic passes over the full payload — measured 38 ms
at the 32^3 x 50ppc bench shape on v5e, 46% of the whole ECSIM step.

This module does the TPU-native analog of the reference's neighbor
exchange with *dimension splitting*: three axis passes (x, y, z), each

1. classifying every slot as stay / +1 / -1 along that axis (XLA,
   elementwise on [G, K]),
2. rolling the payload by +-1 cell along the axis (under GSPMD these
   rolls are the halo collective-permutes — the particle exchange rides
   ICI exactly like the reference's 26-neighbor Isend/Irecv),
3. compacting [own stayers | arrivals from below | arrivals from above]
   into the K slots of each cell with a Pallas kernel: per-group ranks
   are one [K, K] triangular matmul each, the placement is a one-hot
   [K_src, K_dst] built in VMEM, and the merge is a batched
   [8, K_src] x [K_src, K_dst] MXU matmul — no scatters, no sorts, no
   HBM-materialized permutation matrices.

Diagonal movers migrate one axis per pass (the standard dimensional
split).  Anything faster than one cell per axis per step falls back to
the global sort via ``lax.cond`` (the caller counts such "far movers"
first); capacity overflow surfaces as ``dropped`` in the load vector,
which the schemes already treat as a hard error.

Determinism: within a destination cell, the new slot order is
[stayers by old slot | +arrivals by source slot | -arrivals by source
slot] — a pure function of the pre-pass state, independent of the
device mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import Geometry
from .binning import BinnedState, _cell_centers


def _pick_block(G: int, want: int = 64) -> int:
    bg = min(want, G)
    for cand in range(bg, 0, -1):
        if G % cand == 0 and cand % 8 == 0:
            return cand
    for cand in range(bg, 0, -1):
        if G % cand == 0:
            return cand
    return 1


def _merge_kernel(own_ref, up_ref, dn_ref, m0_ref, m1_ref, m2_ref, out_ref):
    """Compact [stayers | up-arrivals | dn-arrivals] into K dst slots.

    Payload blocks are [bg, 8, K] (channels: rx, ry, rz, px, py, pz,
    valid, 0); mask blocks [bg, K] f32.  All rank/one-hot work stays in
    VMEM; the three merges are MXU batched matmuls.
    """
    bg, C, K = own_ref.shape
    f32 = jnp.float32

    # T[j, s] = 1 if j < s: exclusive prefix count by matmul.
    # (Mosaic iota is integer-only; compare in int32, compute in f32.)
    row = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
    T = (row < col).astype(f32)

    m0 = m0_ref[:]
    m1 = m1_ref[:]
    m2 = m2_ref[:]

    def rank(m):
        return jax.lax.dot_general(
            m, T, (((1,), (0,)), ((), ())), preferred_element_type=f32
        )

    s_own = jnp.sum(m0, axis=1, keepdims=True)   # [bg, 1]
    p_up = jnp.sum(m1, axis=1, keepdims=True)

    dst0 = rank(m0)
    dst1 = rank(m1) + s_own
    dst2 = rank(m2) + s_own + p_up

    dcol = jax.lax.broadcasted_iota(jnp.int32, (bg, K, K), 2).astype(f32)

    def merge(P_ref, m, dst):
        oh = m[:, :, None] * (dst[:, :, None] == dcol).astype(f32)
        return jax.lax.dot_general(
            P_ref[:], oh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=f32,
        )

    out_ref[:] = (
        merge(own_ref, m0, dst0)
        + merge(up_ref, m1, dst1)
        + merge(dn_ref, m2, dst2)
    )


@functools.partial(jax.jit, static_argnames=("block_g", "interpret"))
def _merge_pass(own, up, dn, m0, m1, m2, *, block_g: int = 64,
                interpret: bool = False):
    G, C, K = own.shape
    bg = _pick_block(G, block_g)
    grid = (G // bg,)
    pspec = pl.BlockSpec((bg, C, K), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((bg, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _merge_kernel,
        grid=grid,
        in_specs=[pspec, pspec, pspec, mspec, mspec, mspec],
        out_specs=pspec,
        out_shape=jax.ShapeDtypeStruct((G, C, K), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * G * K * K * (C + 4) * 3,
            bytes_accessed=(3 * (C + 1) + C) * G * K * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(own, up, dn, m0, m1, m2)


# Axis metadata: (payload channel, spatial axis in the [nz, ny, nx]
# grid view, extent accessor).  Flat cell ids are x-major:
# g = (cz * ny + cy) * nx + cx.
_AXES = (
    (0, 2, lambda g: g.nx),  # x
    (1, 1, lambda g: g.ny),  # y
    (2, 0, lambda g: g.nz),  # z
)


def _home_coord(geom: Geometry, axis: int) -> jnp.ndarray:
    g = jnp.arange(geom.n_cells, dtype=jnp.int32)
    if axis == 0:
        return g % geom.nx
    if axis == 1:
        return (g // geom.nx) % geom.ny
    return g // (geom.nx * geom.ny)


def _axis_masks(P, geom: Geometry, axis: int):
    """(stay, plus, minus) masks [G, K] along one axis, f32."""
    n = (geom.nx, geom.ny, geom.nz)[axis]
    valid = P[:, 6, :] > 0.5
    c = jnp.clip(jnp.floor(P[:, axis, :]).astype(jnp.int32), 0, n - 1)
    home = _home_coord(geom, axis)[:, None]
    stay = valid & (c == home)
    plus = valid & (c == (home + 1) % n)
    if n == 2:
        # +1 and -1 coincide; count every mover once as a plus-mover.
        minus = jnp.zeros_like(plus)
    else:
        minus = valid & (c == (home - 1) % n)
    f32 = P.dtype
    return stay.astype(f32), plus.astype(f32), minus.astype(f32)


def _roll_cells(A, geom: Geometry, grid_axis: int, shift: int):
    """Roll a [G, ...] per-cell array by ``shift`` cells along one
    spatial axis of the [nz, ny, nx] cell grid."""
    tail = A.shape[1:]
    V = A.reshape((geom.nz, geom.ny, geom.nx) + tail)
    return jnp.roll(V, shift, axis=grid_axis).reshape((geom.n_cells,) + tail)


def far_mover_count(st: BinnedState, geom: Geometry) -> jnp.ndarray:
    """Number of live slots whose move exceeds one cell along any axis
    (these need the global-sort migration path)."""
    total = jnp.zeros((), jnp.int32)
    for axis, _, ext in _AXES:
        n = ext(geom)
        if n == 1:
            continue
        c = jnp.clip(jnp.floor(st.r[..., axis]).astype(jnp.int32), 0, n - 1)
        home = _home_coord(geom, axis).reshape(st.valid.shape[0], 1)
        d = jnp.abs(c - home)
        near = (d <= 1) | (d >= n - 1)
        total = total + jnp.sum(st.valid & ~near).astype(jnp.int32)
    return total


def rebin_neighbor(st: BinnedState, geom: Geometry, *,
                   interpret: bool = False):
    """Dimension-split neighbor migration; same contract as
    ``binning._rebin_global``: returns ``(state, load)`` with
    ``load = [max_per_cell, dropped, moved]``.

    Requires every live slot to move at most one cell per axis (check
    with :func:`far_mover_count` and fall back to the global sort
    otherwise — ``binning._rebin_core`` does exactly that).
    """
    G, K = st.valid.shape
    f32 = st.r.dtype
    valid0 = st.valid

    # moved (exchange statistic): slots whose flat cell id changed.
    from .binning import state_cell_ids

    ids = state_cell_ids(st, geom)
    home_flat = jnp.arange(G, dtype=jnp.int32)[:, None]
    moved = jnp.sum(st.valid & (ids != home_flat)).astype(jnp.int32)
    n_before = jnp.sum(st.valid).astype(jnp.int32)

    # payload [G, 8, K + pad]: rx, ry, rz, px, py, pz, valid, 0.  The
    # axis passes run at a padded width: a cell may transiently hold
    # more than its final count after the x or y pass (arrivals pile up
    # before the later passes spread them), so the intermediate capacity
    # gets headroom that the truncation at the end removes again.
    pad = max(8, (K // 8 + 7) // 8 * 8)
    Kw = K + pad
    P = jnp.concatenate(
        [
            jnp.swapaxes(st.r, 1, 2),
            jnp.swapaxes(st.p, 1, 2),
            st.valid.astype(f32)[:, None, :],
            jnp.zeros((G, 1, K), f32),
        ],
        axis=1,
    )
    P = jnp.concatenate([P, jnp.zeros((G, 8, pad), f32)], axis=2)

    for axis, grid_axis, ext in _AXES:
        if ext(geom) == 1:
            continue
        stay, plus, minus = _axis_masks(P, geom, axis)
        up = _roll_cells(P, geom, grid_axis, +1)
        dn = _roll_cells(P, geom, grid_axis, -1)
        m_up = _roll_cells(plus, geom, grid_axis, +1)
        m_dn = _roll_cells(minus, geom, grid_axis, -1)
        P = _merge_pass(P, up, dn, stay, m_up, m_dn, interpret=interpret)

    # Rows come out front-compacted, so truncating the pad columns keeps
    # exactly min(count, K) live slots per cell; anything beyond K is a
    # capacity overflow, counted as dropped (the schemes raise on it).
    valid_w = P[:, 6, :] > 0.5
    counts_w = jnp.sum(valid_w, axis=1).astype(jnp.int32)

    valid = valid_w[:, :K]
    center = _cell_centers(geom, f32)
    r = jnp.swapaxes(P[:, 0:3, :K], 1, 2)
    p = jnp.swapaxes(P[:, 3:6, :K], 1, 2)
    r = jnp.where(valid[..., None], r, center)
    p = jnp.where(valid[..., None], p, 0.0)

    n_after = jnp.sum(jnp.minimum(counts_w, K)).astype(jnp.int32)
    load = jnp.stack(
        [jnp.max(counts_w), n_before - n_after, moved]
    ).astype(jnp.int32)
    return BinnedState(r=r, p=p, valid=valid), load
