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
exchange, shaped so the per-cell Pallas compaction kernels only ever
touch the *movers*, never the full payload:

1. **partition sort** (XLA lane sort, once per step): each row is
   sorted into [stayers | dead | movers] — one 8-operand [G, K] sort
   costs ~3.5 ms at the bench shape, far less than classify/compact
   kernels over the full [G, 8, K] payload per axis.  The movers land
   in the last AT ~ K/3 columns, from which the mover buffer
   [G, 8, AT] is a static slice, and the stayers form a prefix so
   every column >= n_stay is free for arrivals.
2. **dimension-split exchange on the buffer**: three axis passes
   (x, y, z), each extract (Pallas: classify +-1 along the axis,
   compact per direction via a log2 lane prefix-scan and an A-term
   unrolled select-accumulate — batched per-cell matmuls run at
   0.4 TF/s on the MXU, benchmarks/profile_roofcal.py, so everything
   stays on the VPU) -> roll the [G, A, 8] direction buffers by +-1
   cell (single-chip: a Pallas block copy with a shifted index map —
   XLA's slice+concat roll ran at 23 GB/s; under GSPMD the jnp.roll
   form is kept so the rolls become the halo collective-permutes, the
   particle exchange riding ICI exactly like the reference's
   26-neighbor Isend/Irecv) -> place (Pallas: insert arrivals into the
   buffer's free columns front-first).  Multi-axis movers ride the
   buffer through all three passes.
3. **static tail merge** (XLA): buffer arrivals are compacted by one
   cheap [G, AT] sort, and arrival q enters its destination row at
   column K-1-q — free by the partition-sort invariant whenever
   K-1-q >= n_stay, so the merge is a static-column select with no
   per-row scatter.

Anything the exchange could not route losslessly falls back to the
global sort via ``lax.cond`` before the exchange runs: the guard
(:func:`neighbor_guard_stats`) is *exact* — it simulates the buffer
routing at the counting level, bounding far movers, per-origin
leavers (<= AT), per-direction extracts (<= A) and buffer occupancy
(<= AT) at **every axis stage**, including movers in transit through
a cell's buffer from neighboring source cells between the passes
(transit occupancy can exceed every origin-cell count).  A hot step
therefore costs one slow global sort, never dropped particles.
Genuine K-capacity overflow (a destination cell beyond its slot
budget) surfaces as ``dropped`` in the load vector in both paths and
the schemes raise on it.

Determinism: the partition sort, the buffer passes, and the tail merge
are all keyed by (class, slot index) — a pure function of the pre-pass
state, independent of the device mesh.
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


def _mover_cols(K: int) -> int:
    """Mover-buffer columns per direction (A).  The extract/place
    kernels are A-term unrolled select-accumulates whose cost is
    independent of the lane count (sub-128-lane vectors burn a full
    register either way), so A is the knob that sets their price.
    8 covers the per-axis-per-direction Poisson tail at the bench
    shape.  A step that would exceed A anywhere — including movers in
    transit between the axis passes — is caught by the exact guard
    (:func:`neighbor_guard_stats`) and routed to the global sort, so a
    hot cell costs one slow step instead of dropped particles."""
    return 8


def _buffer_cols(K: int) -> int:
    """Total mover-buffer columns AT: every leaver of a cell must fit
    (CFL-guarded runs move ~6% of a cell's occupancy per step; ceil(K/3)
    rounded up to 8 is >= 5x the Poisson tail at the bench shape).
    Capped at K so the static tail merge can always slice [K-AT:]."""
    return min(K, max(16, (-(-K // 3) + 7) // 8 * 8))


def _rank(m):
    """Exclusive within-group prefix count along lanes, [bg, K] f32.

    Hillis–Steele scan: log2(K) ``pltpu.roll`` + masked-add passes on
    the VPU.  The earlier [bg, K] x [K, K] triangular-matmul form paid
    the batched-small-matmul penalty (measured 0.4 TF/s on v5e for
    such shapes, benchmarks/profile_roofcal.py) and dominated the
    extract/place kernels."""
    K = m.shape[-1]
    axis = m.ndim - 1
    col = jax.lax.broadcasted_iota(jnp.int32, m.shape, axis)
    x = m
    shift = 1
    while shift < K:
        rolled = pltpu.roll(x, shift, axis=axis)
        x = x + jnp.where(col >= shift, rolled, jnp.zeros_like(x))
        shift <<= 1
    return x - m


def _extract_kernel(P_ref, home_ref, out_ref, up_ref, dn_ref, *,
                    axis_ch, n_ax):
    """Classify + clear movers + compact them into direction buffers.

    P [bg, 8, K] payload (channels rx, ry, rz, px, py, pz, valid, 0);
    ``home`` [bg, 1] int32 is each cell's coordinate along the pass axis
    (an operand rather than program-id arithmetic so the same kernel is
    valid inside shard_map, where program ids are shard-local).
    """
    K = P_ref.shape[2]
    A = up_ref.shape[1]  # buffers are [bg, A, C]
    f32 = jnp.float32

    P = P_ref[:]
    home = home_ref[:]                                      # [bg, 1]

    valid = P[:, 6, :] > 0.5
    c = jnp.clip(P[:, axis_ch, :].astype(jnp.int32), 0, n_ax - 1)
    # floor for non-negative positions == int cast (positions >= 0).
    plus = valid & (c == jnp.where(home + 1 == n_ax, 0, home + 1))
    if n_ax == 2:
        minus = jnp.zeros_like(plus)
    else:
        minus = valid & (c == jnp.where(home == 0, n_ax - 1, home - 1))
    mp = plus.astype(f32)
    mm = minus.astype(f32)

    def compact(m, buf_ref):
        rank = _rank(m)                                     # [bg, K]
        cols = []
        for j in range(A):
            sel = m * (rank == float(j))                    # [bg, K]
            # One mover at most matches; masked lane-reduce extracts it.
            cols.append(jnp.sum(P * sel[:, None, :], axis=2))  # [bg, C]
        buf_ref[:] = jnp.stack(cols, axis=1)                # [bg, A, C]

    compact(mp, up_ref)
    compact(mm, dn_ref)
    out_ref[:] = P * (1.0 - mp - mm)[:, None, :]


def _place_kernel(P_ref, up_ref, dn_ref, out_ref):
    """Insert the rolled arrival buffers into each row's free slots.

    Free slots (ch6 == 0) are filled front-first: up-arrivals in source
    order, then dn-arrivals.  Arrivals beyond the free count vanish
    (counted as dropped by the caller).
    """
    bg, C, K = P_ref.shape
    A = up_ref.shape[1]  # buffers are [bg, A, C]
    f32 = jnp.float32

    P = P_ref[:]
    up = up_ref[:]
    dn = dn_ref[:]

    free = 1.0 - P[:, 6, :]                       # [bg, K]
    frank = _rank(free)                           # [bg, K]
    a_up = jnp.sum(up[:, :, 6], axis=1, keepdims=True)  # [bg, 1]

    out = P
    for j in range(A):
        ind_u = free * (frank == float(j))                  # [bg, K]
        ind_d = free * (frank == (a_up + float(j)))
        out = (
            out
            + up[:, j, :][:, :, None] * ind_u[:, None, :]
            + dn[:, j, :][:, :, None] * ind_d[:, None, :]
        )
    out_ref[:] = out


@functools.partial(jax.jit,
                   static_argnames=("axis_ch", "n_ax", "block_g",
                                    "interpret"))
def _extract_pass(P, home, *, axis_ch: int, n_ax: int,
                  block_g: int = 64, interpret: bool = False):
    G, C, K = P.shape
    A = _mover_cols(K)
    bg = _pick_block(G, block_g)
    grid = (G // bg,)
    pspec = pl.BlockSpec((bg, C, K), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    hspec = pl.BlockSpec((bg, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    aspec = pl.BlockSpec((bg, A, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    kernel = functools.partial(_extract_kernel, axis_ch=axis_ch, n_ax=n_ax)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pspec, hspec],
        out_specs=(pspec, aspec, aspec),
        out_shape=(
            jax.ShapeDtypeStruct((G, C, K), jnp.float32),
            jax.ShapeDtypeStruct((G, A, C), jnp.float32),
            jax.ShapeDtypeStruct((G, A, C), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * G * K * (K + 2 * A * C),
            bytes_accessed=2 * G * K * C * 4 + 2 * G * A * C * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(P, home)


@functools.partial(jax.jit, static_argnames=("block_g", "interpret"))
def _place_pass(P, up, dn, *, block_g: int = 64, interpret: bool = False):
    G, C, K = P.shape
    A = up.shape[1]
    bg = _pick_block(G, block_g)
    grid = (G // bg,)
    pspec = pl.BlockSpec((bg, C, K), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    aspec = pl.BlockSpec((bg, A, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _place_kernel,
        grid=grid,
        in_specs=[pspec, aspec, aspec],
        out_specs=pspec,
        out_shape=jax.ShapeDtypeStruct((G, C, K), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * G * K * (K + 2 * A * C),
            bytes_accessed=2 * G * K * C * 4 + 2 * G * A * C * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(P, up, dn)


# Axis metadata: (payload channel == axis id, spatial axis in the
# [nz, ny, nx] grid view, extent accessor, home-coordinate stride in
# flat cells).  Flat cell ids are x-major: g = (cz * ny + cy) * nx + cx.
def _axes(geom: Geometry):
    return (
        (0, 2, geom.nx, 1),
        (1, 1, geom.ny, geom.nx),
        (2, 0, geom.nz, geom.nx * geom.ny),
    )


def _home_coord(geom: Geometry, axis: int) -> jnp.ndarray:
    g = jnp.arange(geom.n_cells, dtype=jnp.int32)
    if axis == 0:
        return g % geom.nx
    if axis == 1:
        return (g // geom.nx) % geom.ny
    return g // (geom.nx * geom.ny)


def _roll_kernel_sub(in_ref, out_ref, *, shift):
    """Roll the sublane (cell) axis of one block in VMEM."""
    out_ref[:] = pltpu.roll(in_ref[:], shift, axis=0)


@functools.partial(jax.jit, static_argnames=("shift", "interpret"))
def _roll_outer_pallas(V, shift: int, interpret: bool = False):
    """[n, R] rolled along axis 0 by a pure block copy with a shifted
    index map — each grid step DMAs row (i - shift) mod n to row i.
    The row is viewed [S, 128] to satisfy Mosaic's (8, 128) block
    tiling (the caller checks ny*nx*A*C % 1024 == 0 and falls back to
    jnp.roll otherwise)."""
    n, R = V.shape
    S = R // 128
    V3 = V.reshape(n, S, 128)

    def copy_kernel(in_ref, out_ref):
        out_ref[:] = in_ref[:]

    out = pl.pallas_call(
        copy_kernel,
        grid=(n,),
        in_specs=[pl.BlockSpec((1, S, 128),
                               lambda i: ((i - shift) % n, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, S, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, S, 128), V.dtype),
        interpret=interpret,
    )(V3)
    return out.reshape(n, R)


@functools.partial(jax.jit, static_argnames=("n_blocks", "shift",
                                             "interpret"))
def _roll_inner_pallas(V, n_blocks: int, shift: int,
                       interpret: bool = False):
    """[n_blocks * L, R] rolled by ``shift`` rows *within* each
    consecutive L-row block (the x / y cell-line rolls): one
    ``pltpu.roll`` over the sublane axis per block, all in VMEM."""
    nR, R = V.shape
    L = nR // n_blocks
    return pl.pallas_call(
        functools.partial(_roll_kernel_sub, shift=shift % L),
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec((L, R), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((L, R), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nR, R), V.dtype),
        interpret=interpret,
    )(V)


def _roll_cells(Abuf, geom: Geometry, grid_axis: int, shift: int,
                *, mesh=None, interpret: bool = False):
    """Roll a [G, A, C] mover buffer by ``shift`` cells along one
    spatial axis of the [nz, ny, nx] cell grid.  The buffer is viewed
    as [..., A*C] so the rolled lane dimension is dense (A*C = 64 for
    the default 8 columns x 8 channels).

    Under a mesh the jnp.roll form is kept: GSPMD turns it into the
    halo collective-permute that carries movers across shards.
    Single-chip, jnp.roll lowers to slice+concat at ~23 GB/s
    (benchmarks/profile_roofcal.py), so the Pallas forms are used:
    z rolls whole [ny*nx, A*C] planes via a shifted block index map,
    x / y roll sublanes within each cell line / plane in VMEM."""
    G, A, C = Abuf.shape
    AC = A * C
    plane_bytes = geom.ny * geom.nx * AC * Abuf.dtype.itemsize
    # Mosaic wants (sublane % 8, lane % 128) blocks — or a lane dim that
    # equals the full array dim, which the x/y sublane rolls use.  The z
    # path views rows as [ny*nx*AC/128, 128].  Odd-shaped (test-sized)
    # grids fall back to jnp.roll.
    pallas_ok = (
        mesh is None
        and not (grid_axis <= 1 and plane_bytes > 4 << 20)
        and not (grid_axis == 0 and (geom.ny * geom.nx * AC) % 1024)
        and not (grid_axis == 1 and geom.ny % 8)
        and not (grid_axis == 2 and geom.nx % 8)
    )
    if not pallas_ok:
        V = Abuf.reshape(geom.nz, geom.ny, geom.nx, AC)
        return jnp.roll(V, shift, axis=grid_axis).reshape(G, A, C)
    flat = Abuf.reshape(G, AC)
    if grid_axis == 0:  # z: stride ny*nx rows — block-shifted copy
        V = flat.reshape(geom.nz, geom.ny * geom.nx * AC)
        out = _roll_outer_pallas(V, shift, interpret=interpret)
    elif grid_axis == 1:  # y: roll ny-row groups within each z plane
        out = _roll_inner_pallas(
            flat.reshape(geom.nz * geom.ny, geom.nx * AC),
            geom.nz, shift, interpret=interpret)
    else:  # x: roll nx-row groups within each (z, y) line
        out = _roll_inner_pallas(flat, geom.nz * geom.ny, shift,
                                 interpret=interpret)
    return out.reshape(G, A, C)


def far_mover_count(st: BinnedState, geom: Geometry) -> jnp.ndarray:
    """Number of live slots whose move exceeds one cell along any axis
    (these need the global-sort migration path).  A ``d == n-1`` move
    is a one-cell wrap only on PERIODIC axes; on reflective/open axes
    such a traversal (practically unreachable under the CFL guard) is
    classified far so the extract kernel's unconditional wrap never
    applies to it."""
    from ..config import PERIODIC

    total = jnp.zeros((), jnp.int32)
    for axis, _, n, _s in _axes(geom):
        if n == 1:
            continue
        c = jnp.clip(jnp.floor(st.r[..., axis]).astype(jnp.int32), 0, n - 1)
        home = _home_coord(geom, axis).reshape(st.valid.shape[0], 1)
        d = jnp.abs(c - home)
        near = d <= 1
        if geom.bounds[axis] == PERIODIC:
            near |= d >= n - 1
        total = total + jnp.sum(st.valid & ~near).astype(jnp.int32)
    return total


def _axis_direction_masks(st: BinnedState, geom: Geometry):
    """Per-axis (plus, minus, stay) slot masks, classified EXACTLY as
    the extract kernel does (c == wrapped home+-1), except that the
    wrap counts as a one-cell move only on PERIODIC axes — on
    reflective/open axes a full-axis traversal is ``far`` so the
    kernel's unconditional wrap never applies to it.  Returns
    ``(masks, far)`` where ``masks[axis] = (plus, minus, stay)`` and
    ``far`` flags slots the exchange cannot route (need the global
    sort)."""
    from ..config import PERIODIC

    G, K = st.valid.shape
    masks = []
    far = jnp.zeros((G, K), bool)
    for axis, _grid, n, _s in _axes(geom):
        if n == 1:
            z = jnp.zeros((G, K), bool)
            masks.append((z, z, jnp.ones((G, K), bool)))
            continue
        periodic = geom.bounds[axis] == PERIODIC
        c = jnp.clip(jnp.floor(st.r[..., axis]).astype(jnp.int32), 0, n - 1)
        home = _home_coord(geom, axis).reshape(G, 1)
        stay = c == home
        plus = c == home + 1
        minus = c == home - 1
        if periodic:
            plus |= (home == n - 1) & (c == 0)
            if n > 2:
                minus |= (home == 0) & (c == n - 1)
        if n == 2:
            minus = jnp.zeros((G, K), bool)  # the kernel routes all as plus
        masks.append((plus, minus, stay))
        far |= ~(stay | plus | minus)
    return masks, far


def neighbor_guard_stats(st: BinnedState, geom: Geometry):
    """One pass over the state yielding the neighbor-path guard and the
    exchange statistics: ``(neighbor_ok, moved, n_before)``.

    ``neighbor_ok`` is EXACT for the dimension-split exchange: it
    simulates the buffer routing at the counting level.  Movers are
    classified per axis exactly as the extract kernel will classify
    them, counted per origin cell into 27 (dx, dy, dz)-class counts
    (cheap masked lane reductions — one payload read, fused by XLA),
    and those [G] count maps are then rolled along the pass axes to
    bound the buffer state at every stage:

    * stage 0 (origin): leavers per cell <= AT; x-direction counts
      <= A per direction;
    * stage 1 (after the x pass, movers grouped by (oz, oy, dx) — a
      cell's buffer also carries movers in transit out of its x
      neighbors): occupancy <= AT; y-direction counts <= A;
    * stage 2 (after y, grouped by (oz, dy, dx)): occupancy <= AT;
      z-direction counts <= A;
    * stage 3 (arrivals per destination): <= AT.

    Plus the routing precondition: no ``far`` movers (more than one
    cell along any axis; on non-periodic axes a full-axis traversal is
    far).  Any violation routes the step to the global sort — one slow
    step instead of dropped particles.  The rolls run on [G]-sized
    count maps, so the whole guard costs one payload read."""
    G, K = st.valid.shape
    AT = _buffer_cols(K)
    A = _mover_cols(K)

    masks, far = _axis_direction_masks(st, geom)
    (xp_m, xm_m, xs_m), (yp_m, ym_m, ys_m), (zp_m, zm_m, zs_m) = masks
    routable = st.valid & ~far
    mover = routable & ~(xs_m & ys_m & zs_m)
    moved = jnp.sum(mover).astype(jnp.int32)
    n_before = jnp.sum(st.valid).astype(jnp.int32)
    ok = jnp.sum(st.valid & far) == 0

    def cnt(mask):
        return jnp.sum(mover & mask, axis=1).astype(jnp.int32)  # [G]

    shape3 = (geom.nz, geom.ny, geom.nx)

    def roll3(v, gx=0, gy=0, gz=0):
        out = v.reshape(shape3)
        if gx:
            out = jnp.roll(out, gx, axis=2)
        if gy:
            out = jnp.roll(out, gy, axis=1)
        if gz:
            out = jnp.roll(out, gz, axis=0)
        return out.reshape(-1)

    x_cls = ((xp_m, 1), (xm_m, -1), (xs_m, 0))
    y_cls = ((yp_m, 1), (ym_m, -1), (ys_m, 0))
    z_cls = ((zp_m, 1), (zm_m, -1), (zs_m, 0))

    # stage 0: per-origin totals and x-direction counts
    leav = cnt(jnp.ones_like(mover))
    ok &= jnp.max(leav) <= AT
    ok &= jnp.max(cnt(xp_m)) <= A
    ok &= jnp.max(cnt(xm_m)) <= A

    # stage 1: movers grouped by (oz, oy, dx) — roll the x classes
    occ1 = jnp.zeros(G, jnp.int32)
    yp1 = jnp.zeros(G, jnp.int32)
    ym1 = jnp.zeros(G, jnp.int32)
    for mx, i in x_cls:
        occ1 += roll3(cnt(mx), gx=i)
        yp1 += roll3(cnt(mx & yp_m), gx=i)
        ym1 += roll3(cnt(mx & ym_m), gx=i)
    ok &= jnp.max(occ1) <= AT
    ok &= jnp.max(yp1) <= A
    ok &= jnp.max(ym1) <= A

    # stage 2: grouped by (oz, dy, dx) — roll x and y classes
    occ2 = jnp.zeros(G, jnp.int32)
    zp2 = jnp.zeros(G, jnp.int32)
    zm2 = jnp.zeros(G, jnp.int32)
    for mx, i in x_cls:
        for my, j in y_cls:
            occ2 += roll3(cnt(mx & my), gx=i, gy=j)
            zp2 += roll3(cnt(mx & my & zp_m), gx=i, gy=j)
            zm2 += roll3(cnt(mx & my & zm_m), gx=i, gy=j)
    ok &= jnp.max(occ2) <= AT
    ok &= jnp.max(zp2) <= A
    ok &= jnp.max(zm2) <= A

    # stage 3: arrivals per destination — occ2's z classes rolled home
    occ3 = roll3(zp2, gz=1) + roll3(zm2, gz=-1) + (occ2 - zp2 - zm2)
    ok &= jnp.max(occ3) <= AT
    return ok, moved, n_before


def _cell_partition_spec(mesh):
    """PartitionSpec entry for the flat (z-major) cell axis."""
    from jax.sharding import PartitionSpec as P

    axes = tuple(mesh.axis_names) if len(mesh.axis_names) > 1 else "z"
    return P, axes


def _shardmap_extract(mesh, axis_ch, n_ax, interpret):
    """Wrap the (cell-local) extract kernel in shard_map over the cell
    axis — pl.pallas_call has no SPMD partitioning rule, so under a
    mesh each shard runs its own kernel on its own cell block (the
    cross-cell communication lives in the rolls outside)."""
    from jax import shard_map

    P, axes = _cell_partition_spec(mesh)
    fn = functools.partial(_extract_pass, axis_ch=axis_ch, n_ax=n_ax,
                           interpret=interpret)
    return shard_map(
        fn, mesh=mesh,
        in_specs=(P(axes, None, None), P(axes, None)),
        out_specs=(P(axes, None, None), P(axes, None, None),
                   P(axes, None, None)),
        check_vma=False,
    )


def _shardmap_place(mesh, interpret):
    from jax import shard_map

    P, axes = _cell_partition_spec(mesh)
    fn = functools.partial(_place_pass, interpret=interpret)
    return shard_map(
        fn, mesh=mesh,
        in_specs=(P(axes, None, None), P(axes, None, None),
                  P(axes, None, None)),
        out_specs=P(axes, None, None),
        check_vma=False,
    )


def rebin_neighbor(st: BinnedState, geom: Geometry, *,
                   mesh=None, interpret: bool = False, stats=None):
    """Dimension-split neighbor migration; same contract as
    ``binning._rebin_global``: returns ``(state, load)`` with
    ``load = [max_per_cell, dropped, moved]``.

    Requires every live slot to move at most one cell per axis (check
    with :func:`far_mover_count` and fall back to the global sort
    otherwise — ``binning._rebin_core`` does exactly that).  Under a
    ``mesh`` the Pallas kernels run per-shard via shard_map (the rolls
    between them stay global, so GSPMD turns them into the halo
    collective-permutes that carry the movers across shards).

    ``stats``, if given, is the precomputed ``(moved, n_before)`` pair —
    the guard in ``binning._rebin_neighbor_guarded`` already reads the
    full state for the far-mover count, so recomputing the exchange
    statistics here would be a second full pass.
    """
    G, K = st.valid.shape
    f32 = st.r.dtype
    AT = _buffer_cols(K)

    from .binning import state_cell_ids

    ids = state_cell_ids(st, geom)
    home_flat = jnp.arange(G, dtype=jnp.int32)[:, None]
    mover = st.valid & (ids != home_flat)
    if stats is None:
        moved = jnp.sum(mover).astype(jnp.int32)
        n_before = jnp.sum(st.valid).astype(jnp.int32)
    else:
        moved, n_before = stats

    # 1. One per-row partition sort: [stayers | dead | movers].  An
    # 8-operand lane sort costs ~3.5 ms at the bench shape — far
    # cheaper than running the extract/place kernels over the full
    # [G, 8, K] payload per axis (the A-term compaction is O(A * K)
    # per cell; on the AT-column buffer it is O(A * AT)).  With the
    # stayers compacted to a prefix, every column >= n_stay is free for
    # arrivals once the movers depart — no capacity is stranded in the
    # leavers' old slots.
    key = jnp.where(mover, 2, jnp.where(st.valid, 0, 1)).astype(jnp.int32)
    kcol = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None, :],
                            (G, K))
    out = jax.lax.sort(
        (key, kcol,
         st.r[..., 0], st.r[..., 1], st.r[..., 2],
         st.p[..., 0], st.p[..., 1], st.p[..., 2]),
        num_keys=2, dimension=1)
    key_s = out[0]
    planes = out[2:8]
    stay = key_s == 0
    n_stay = jnp.sum(stay, axis=1).astype(jnp.int32)

    # 2. Mover buffer [G, 8, AT] from the row tails: channels rx, ry,
    # rz, px, py, pz, valid, 0.  Rows with more than AT movers lose the
    # excess (counted as dropped below; the CFL guard makes >AT leavers
    # per cell a capacity fault, same class as K overflow).
    bufv = (key_s[:, K - AT:] == 2).astype(f32)
    buf = jnp.stack(
        [pln[:, K - AT:] * bufv for pln in planes]
        + [bufv, jnp.zeros_like(bufv)],
        axis=1,
    )

    if mesh is None:
        place = functools.partial(_place_pass, interpret=interpret)
    else:
        place = _shardmap_place(mesh, interpret)

    # 3. Dimension-split exchange on the buffer only.  Multi-axis
    # movers ride the buffer through all passes; everything in the
    # buffer is home after the z pass.
    for axis_ch, grid_axis, n_ax, _stride in _axes(geom):
        if n_ax == 1:
            continue
        home = _home_coord(geom, axis_ch)[:, None]  # [G, 1] int32
        if mesh is None:
            extract = functools.partial(_extract_pass, axis_ch=axis_ch,
                                        n_ax=n_ax, interpret=interpret)
        else:
            extract = _shardmap_extract(mesh, axis_ch, n_ax, interpret)
        buf, up, dn = extract(buf, home)
        up = _roll_cells(up, geom, grid_axis, +1, mesh=mesh,
                         interpret=interpret)
        dn = _roll_cells(dn, geom, grid_axis, -1, mesh=mesh,
                         interpret=interpret)
        buf = place(buf, up, dn)

    # 4. Compact the arrivals (valid first, stable in buffer order —
    # a deterministic function of the pre-pass state).
    bcol = jnp.broadcast_to(jnp.arange(AT, dtype=jnp.int32)[None, :],
                            (G, AT))
    bkey = jnp.where(buf[:, 6, :] > 0.5, 0, 1).astype(jnp.int32)
    bout = jax.lax.sort(
        (bkey, bcol) + tuple(buf[:, c, :] for c in range(6)),
        num_keys=2, dimension=1)
    arr_ok = bout[0] == 0
    arr = bout[2:8]

    # 5. Static tail merge: arrival q -> column K-1-q, which the
    # partition sort guarantees is free iff K-1-q >= n_stay (stayers
    # are a prefix; everything after them is dead or departed).  Rows
    # whose tail cannot hold every arrival drop the excess (counted).
    qs = jnp.arange(AT, dtype=jnp.int32)[None, :]
    ok = arr_ok & ((K - 1 - qs) >= n_stay[:, None])  # [G, AT]
    okr = ok[:, ::-1]
    center = _cell_centers(geom, f32)

    r_stay = jnp.stack(planes[0:3], axis=-1)
    p_stay = jnp.stack(planes[3:6], axis=-1)
    r_stay = jnp.where(stay[..., None], r_stay, center)
    p_stay = jnp.where(stay[..., None], p_stay, 0.0)
    arr_r = jnp.stack(arr[0:3], axis=-1)[:, ::-1, :]
    arr_p = jnp.stack(arr[3:6], axis=-1)[:, ::-1, :]
    r = jnp.concatenate(
        [r_stay[:, : K - AT],
         jnp.where(okr[..., None], arr_r, r_stay[:, K - AT:])], axis=1)
    p = jnp.concatenate(
        [p_stay[:, : K - AT],
         jnp.where(okr[..., None], arr_p, p_stay[:, K - AT:])], axis=1)
    valid = jnp.concatenate(
        [stay[:, : K - AT], stay[:, K - AT:] | okr], axis=1)

    counts = jnp.sum(valid, axis=1).astype(jnp.int32)
    n_after = jnp.sum(counts).astype(jnp.int32)
    load = jnp.stack(
        [jnp.max(counts), n_before - n_after, moved]
    ).astype(jnp.int32)
    return BinnedState(r=r, p=p, valid=valid), load
