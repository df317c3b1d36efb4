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

1. **extract** (Pallas): classify every slot as stay / +1 / -1 along
   the axis (home coordinates derived from the grid program id — no
   XLA-side mask materialization), compact each cell's movers into a
   small [G, 8, A] buffer (A ~ 16 columns) and clear them from the
   resident rows.  Group ranks come from one [K, K] triangular matmul;
   the compaction itself is an A-term unrolled select-accumulate on the
   VPU — batched per-cell matmuls are catastrophically slow on the MXU
   (measured 10.5 ms/axis for [8, K] x [K, A] per cell at the bench
   shape), the unrolled form is pure vector work.
2. **roll**: move only the mover buffers by +-1 cell along the axis,
   viewed as [G, 8A] so the lane dimension is exactly 128 (an [G, 8, A]
   roll pays an 8x lane-padding tax).  Under GSPMD these rolls are the
   halo collective-permutes — the particle exchange rides ICI exactly
   like the reference's 26-neighbor Isend/Irecv, at mover-buffer size.
3. **place** (Pallas): insert the up-to-2A arrivals into each
   destination row's free slots (holes left by leavers and dead
   padding, filled front-first), again A-term unrolled.

Payload-carrying contractions avoid the MXU's default single-pass bf16
(it truncates particle coordinates); the rank matmuls run at
``Precision.HIGHEST`` (exact for small integers).

Diagonal movers migrate one axis per pass (the standard dimensional
split).  Anything faster than one cell per axis per step falls back to
the global sort via ``lax.cond`` (the caller counts such "far movers"
first); capacity overflow (more movers per row/direction than A, or a
full destination row) surfaces as ``dropped`` in the load vector,
which the schemes already treat as a hard error.

Determinism: arrivals fill free slots in (direction, source-slot)
order — a pure function of the pre-pass state, independent of the
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

HIGH = jax.lax.Precision.HIGHEST


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
    """Mover-buffer columns per direction (A).  Thermal CFL-guarded runs
    move only a few percent of a cell's slots per axis per direction;
    16 columns is ~4x the Poisson tail at 100 ppc."""
    return max(16, -(-K // 8) // 8 * 8)


def _rank_matrix(K: int, dtype):
    """T[j, s] = 1 if j < s (exclusive prefix count by matmul —
    Mosaic iota is integer-only, so compare in int32)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
    return (row < col).astype(dtype)


def _rank(m):
    """Exclusive within-group prefix count along lanes, [bg, K] f32."""
    T = _rank_matrix(m.shape[1], m.dtype)
    return jax.lax.dot_general(m, T, (((1,), (0,)), ((), ())),
                               preferred_element_type=m.dtype,
                               precision=HIGH)


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


def _roll_cells(Abuf, geom: Geometry, grid_axis: int, shift: int):
    """Roll a [G, A, C] mover buffer by ``shift`` cells along one
    spatial axis of the [nz, ny, nx] cell grid.  The buffer is viewed
    as [..., A*C] so the rolled lane dimension is dense (A*C = 128 for
    the default 16 columns x 8 channels)."""
    G, A, C = Abuf.shape
    V = Abuf.reshape(geom.nz, geom.ny, geom.nx, A * C)
    return jnp.roll(V, shift, axis=grid_axis).reshape(G, A, C)


def far_mover_count(st: BinnedState, geom: Geometry) -> jnp.ndarray:
    """Number of live slots whose move exceeds one cell along any axis
    (these need the global-sort migration path)."""
    total = jnp.zeros((), jnp.int32)
    for axis, _, n, _s in _axes(geom):
        if n == 1:
            continue
        c = jnp.clip(jnp.floor(st.r[..., axis]).astype(jnp.int32), 0, n - 1)
        home = _home_coord(geom, axis).reshape(st.valid.shape[0], 1)
        d = jnp.abs(c - home)
        near = (d <= 1) | (d >= n - 1)
        total = total + jnp.sum(st.valid & ~near).astype(jnp.int32)
    return total


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
                   mesh=None, interpret: bool = False):
    """Dimension-split neighbor migration; same contract as
    ``binning._rebin_global``: returns ``(state, load)`` with
    ``load = [max_per_cell, dropped, moved]``.

    Requires every live slot to move at most one cell per axis (check
    with :func:`far_mover_count` and fall back to the global sort
    otherwise — ``binning._rebin_core`` does exactly that).  Under a
    ``mesh`` the Pallas kernels run per-shard via shard_map (the rolls
    between them stay global, so GSPMD turns them into the halo
    collective-permutes that carry the movers across shards).
    """
    G, K = st.valid.shape
    f32 = st.r.dtype

    # moved (exchange statistic): slots whose flat cell id changed.
    from .binning import state_cell_ids

    ids = state_cell_ids(st, geom)
    home_flat = jnp.arange(G, dtype=jnp.int32)[:, None]
    moved = jnp.sum(st.valid & (ids != home_flat)).astype(jnp.int32)
    n_before = jnp.sum(st.valid).astype(jnp.int32)

    # payload [G, 8, K + A]: rx, ry, rz, px, py, pz, valid, 0.  The A
    # pad columns give transient headroom: a cell may briefly exceed its
    # final count after the x or y pass (arrivals land before the later
    # passes move them on).  Free slots fill front-first, so the pad is
    # touched only on transient overflow; the fixup below re-places any
    # pad occupants into the first K columns.  Invalid slots are parked
    # at cell centers in BinnedState; the place kernel ADDS arrivals
    # onto free slots, so their payload must be zero here (re-parked
    # after the passes).
    A = _mover_cols(K)
    vf = st.valid.astype(f32)[:, None, :]
    P = jnp.concatenate(
        [
            jnp.swapaxes(st.r, 1, 2) * vf,
            jnp.swapaxes(st.p, 1, 2) * vf,
            vf,
            jnp.zeros((G, 1, K), f32),
        ],
        axis=1,
    )
    P = jnp.concatenate([P, jnp.zeros((G, 8, A), f32)], axis=2)

    if mesh is None:
        place = functools.partial(_place_pass, interpret=interpret)
    else:
        place = _shardmap_place(mesh, interpret)

    for axis_ch, grid_axis, n_ax, stride in _axes(geom):
        if n_ax == 1:
            continue
        home = _home_coord(geom, axis_ch)[:, None]  # [G, 1] int32
        if mesh is None:
            extract = functools.partial(_extract_pass, axis_ch=axis_ch,
                                        n_ax=n_ax, interpret=interpret)
        else:
            extract = _shardmap_extract(mesh, axis_ch, n_ax, interpret)
        P, up, dn = extract(P, home)
        up = _roll_cells(up, geom, grid_axis, +1)
        dn = _roll_cells(dn, geom, grid_axis, -1)
        P = place(P, up, dn)

    # Fixup: pad-column occupants (transient overflow survivors) move
    # into free slots of the first K columns; if none are free the row
    # is genuinely over capacity and they count as dropped.
    pad_buf = jnp.swapaxes(P[:, :, K:], 1, 2)  # [G, A, C]
    pad_occupancy = jnp.sum(pad_buf[:, :, 6]).astype(jnp.int32)
    P = jax.lax.cond(
        pad_occupancy > 0,
        lambda args: place(args[0], args[1], jnp.zeros_like(args[1])),
        lambda args: args[0],
        (P[:, :, :K], pad_buf),
    )

    valid = P[:, 6, :] > 0.5
    center = _cell_centers(geom, f32)
    r = jnp.swapaxes(P[:, 0:3, :], 1, 2)
    p = jnp.swapaxes(P[:, 3:6, :], 1, 2)
    r = jnp.where(valid[..., None], r, center)
    p = jnp.where(valid[..., None], p, 0.0)

    counts = jnp.sum(valid, axis=1).astype(jnp.int32)
    n_after = jnp.sum(counts).astype(jnp.int32)
    load = jnp.stack(
        [jnp.max(counts), n_before - n_after, moved]
    ).astype(jnp.int32)
    return BinnedState(r=r, p=p, valid=valid), load
