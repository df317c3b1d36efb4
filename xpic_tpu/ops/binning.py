"""Cell-binned (padded) particle views.

A sorted species is augmented with a dense ``[n_cells, K]`` index map
(K = per-cell capacity).  Every gather/scatter kernel then runs as dense
arithmetic over the ``[n_cells, K]`` layout with *cell-anchored* stencil
windows, so deposits reduce with plain sums plus a handful of rolled
grid adds — no atomic scatters (the TPU answer to the reference's
``#pragma omp atomic`` scatter loops, src/impls/ecsim/particles.cpp:137-142).
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial

import jax
import jax.numpy as jnp

from ..config import PERIODIC, REFLECTIVE, Geometry
from ..particles import ParticleArrays, cell_ids


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BinnedSpecies:
    """Padded per-cell view of one (cell-sorted) species.

    ``index[g, k]`` is the flat particle index of slot k in cell g (an
    arbitrary in-bounds index for invalid slots); ``valid[g, k]`` masks
    real particles. ``r``/``p`` are the gathered per-slot coordinates in
    grid units and velocities.
    """

    index: jax.Array  # [G, K] int32
    valid: jax.Array  # [G, K] bool
    r: jax.Array  # [G, K, 3] positions in grid units (x/dx, y/dy, z/dz)
    p: jax.Array  # [G, K, 3]
    seg: jax.Array  # [G + 1] int32 segment starts (first flat index per cell)

    @property
    def n_cells(self) -> int:
        return self.index.shape[0]

    @property
    def slots(self) -> int:
        return self.index.shape[1]


def max_per_cell(sp: ParticleArrays, geom: Geometry) -> int:
    """Host-side: the maximum particle count of any cell (for choosing K)."""
    import numpy as np

    ids = np.asarray(cell_ids(sp, geom))
    ids = ids[ids < geom.n_cells]
    if ids.size == 0:
        return 0
    return int(np.bincount(ids, minlength=geom.n_cells).max())


def choose_slots(k_max: int, pad: int = 8) -> int:
    """Round the per-cell capacity up to a lane-friendly bucket."""
    return max(pad, ((k_max + pad - 1) // pad) * pad)


@partial(jax.jit, static_argnames=("geom", "slots"))
def bin_sorted(sp: ParticleArrays, geom: Geometry, slots: int) -> BinnedSpecies:
    """Build the padded view of a cell-sorted species.

    Requires ``sp`` sorted by flat cell id (see
    :func:`xpic_tpu.particles.sort_by_cell`).  Slot-within-cell comes
    from a searchsorted against the first occurrence of each id; the
    single scatter below has unique destination indices, which XLA
    lowers efficiently.
    """
    n = sp.r.shape[0]
    ids = cell_ids(sp, geom)  # sorted; dead -> n_cells
    G = geom.n_cells

    # Segment starts per cell by binary search over the G+1 cell
    # boundaries (cheap: G queries, not n) — the padded view is then a
    # pure gather, which lowers much better on TPU than the equivalent
    # scatter-pad.
    seg = jnp.searchsorted(ids, jnp.arange(G + 1, dtype=jnp.int32)).astype(
        jnp.int32
    )
    k = jnp.arange(slots, dtype=jnp.int32)[None, :]
    pos = seg[:G, None] + k
    valid = pos < seg[1:, None]
    index = jnp.minimum(pos, n - 1)

    # One packed gather (24-byte rows) instead of two 12-byte ones —
    # TPU dynamic-gather cost scales with descriptor count, not bytes.
    d = jnp.asarray([geom.dx, geom.dy, geom.dz], dtype=sp.r.dtype)
    rp = jnp.concatenate([sp.r / d, sp.p], axis=1)[index]
    r, p = rp[..., :3], rp[..., 3:]

    # Park invalid slots at the cell's own center so their (masked)
    # weights stay finite and cell-anchored windows remain valid.
    g = jnp.arange(G, dtype=jnp.int32)
    center = jnp.stack(
        [
            (g % geom.nx).astype(sp.r.dtype) + 0.5,
            ((g // geom.nx) % geom.ny).astype(sp.r.dtype) + 0.5,
            (g // (geom.nx * geom.ny)).astype(sp.r.dtype) + 0.5,
        ],
        axis=-1,
    )[:, None, :]
    r = jnp.where(valid[..., None], r, center)
    p = jnp.where(valid[..., None], p, 0.0)
    return BinnedSpecies(index=index, valid=valid, r=r, p=p, seg=seg)


def scatter_back(binned: BinnedSpecies, values: jax.Array, n: int,
                 ids: jax.Array | None = None) -> jax.Array:
    """Per-slot values [G, K, ...] back to flat particle order [n, ...].

    Formulated as a *gather*, not a scatter: the view was built from a
    cell-sorted species, so flat slot ``i`` lives at
    ``(g, k) = (ids[i], i - seg[ids[i]])``.  TPU scatters of small rows
    are ~10x slower than the equivalent gather (measured 110 ms vs
    12 ms for 2.6M rows on v5e), so the inverse permutation is read
    back instead of written forward.  ``ids`` are the (sorted) flat
    cell ids; when omitted they are recomputed from ``binned.seg``.
    Slots the view dropped (overflow beyond K, dead) read zeros.
    """
    G, K = binned.index.shape
    if ids is None:
        # invert seg: ids[i] = the cell whose segment contains i
        ids = (
            jnp.searchsorted(binned.seg, jnp.arange(n, dtype=jnp.int32),
                             side="right").astype(jnp.int32) - 1
        )
    g = jnp.minimum(ids, G)
    k = jnp.arange(n, dtype=jnp.int32) - binned.seg[g]
    ok = (ids < G) & (k >= 0) & (k < K)
    gk = jnp.where(ok, g * K + jnp.clip(k, 0, K - 1), 0)
    flat = values.reshape((G * K,) + values.shape[2:])[gk]
    mask = ok.reshape((n,) + (1,) * (values.ndim - 2))
    return jnp.where(mask, flat, 0)


# -- persistent binned state (the production hot-path layout) --------------
#
# The flat-primary pipeline above pays three large permutations per step
# (full payload sort, padded-view gather, inverse-binning gather) —
# measured 12 + 19 + 47 ms at the 32^3 x 50ppc bench shape on v5e.  The
# persistent layout keeps the species *in* the padded [G, K] view across
# steps, so one keys-only sort plus one packed 24-byte-row gather per
# step is the entire permutation cost (~10 + 18 ms measured).  This is
# the TPU counterpart of the reference's always-binned
# ``std::vector<std::list<Point>>`` storage + update_cells migration
# (src/interfaces/particles.{h,cpp}).


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BinnedState:
    """Persistent cell-binned species state.

    ``r`` is the position in *grid units* (x/dx, y/dy, z/dz) so that
    ``floor(r)`` is the cell and ``r - cell`` the spline offset;
    ``valid`` masks live slots.  Invalid slots hold the owning cell's
    center (finite weights) and zero velocity.
    """

    r: jax.Array  # [G, K, 3]
    p: jax.Array  # [G, K, 3]
    valid: jax.Array  # [G, K] bool

    @property
    def n_cells(self) -> int:
        return self.r.shape[0]

    @property
    def slots(self) -> int:
        return self.r.shape[1]


def _cell_centers(geom: Geometry, dtype) -> jax.Array:
    g = jnp.arange(geom.n_cells, dtype=jnp.int32)
    return jnp.stack(
        [
            (g % geom.nx).astype(dtype) + 0.5,
            ((g // geom.nx) % geom.ny).astype(dtype) + 0.5,
            (g // (geom.nx * geom.ny)).astype(dtype) + 0.5,
        ],
        axis=-1,
    )[:, None, :]


def state_cell_ids(st: BinnedState, geom: Geometry) -> jax.Array:
    """Flat cell id per slot from the current positions (dead -> G)."""
    n = jnp.asarray([geom.nx, geom.ny, geom.nz], jnp.int32)
    c = jnp.clip(jnp.floor(st.r).astype(jnp.int32), 0, n - 1)
    flat = (c[..., 2] * geom.ny + c[..., 1]) * geom.nx + c[..., 0]
    return jnp.where(st.valid, flat, geom.n_cells).astype(jnp.int32)


def _rebin_global(st: BinnedState, geom: Geometry):
    """Re-sort a drifted binned state into its new cells (global sort).

    One (id, slot)-keyed sort of the flat slot ids plus a single packed
    6-column gather — the per-step migration (update_cells_seq,
    src/interfaces/particles.cpp:79-112).  Deterministic: the slot-index
    tiebreaker makes the permutation unique, so per-cell deposit order
    is reproducible across runs and decompositions.

    Returns ``(state, load)`` where ``load = [max_per_cell, dropped,
    moved]`` (int32): the maximum true occupancy of any cell before
    padding, the number of live particles dropped because their
    destination cell exceeded the K slots, and the number that changed
    cell this step (the reference's sent/received exchange statistics,
    interfaces/particles.cpp:227-246).
    """
    G, K = st.valid.shape
    NK = G * K
    ids = state_cell_ids(st, geom).reshape(NK)
    tie = jnp.arange(NK, dtype=jnp.int32)
    moved = jnp.sum((ids != tie // K) & (ids < G))
    cols = (
        st.r[..., 0].reshape(NK), st.r[..., 1].reshape(NK),
        st.r[..., 2].reshape(NK),
        st.p[..., 0].reshape(NK), st.p[..., 1].reshape(NK),
        st.p[..., 2].reshape(NK),
    )
    # Payload rides the sort: one 8-operand sort + one padded 24-byte-row
    # gather measures ~20% cheaper than keys-only sort + index gather +
    # payload gather (the extra 4-byte perm[pos] gather costs more than
    # carrying 24B/row through the sorting network).
    out = jax.lax.sort((ids, tie) + cols, num_keys=2)
    s_ids = out[0]

    seg = jnp.searchsorted(s_ids, jnp.arange(G + 1, dtype=jnp.int32)).astype(
        jnp.int32
    )
    counts = seg[1:] - seg[:G]
    load = jnp.stack(
        [jnp.max(counts), jnp.sum(jnp.maximum(counts - K, 0)), moved]
    ).astype(jnp.int32)

    k = jnp.arange(K, dtype=jnp.int32)[None, :]
    pos = seg[:G, None] + k
    valid = pos < seg[1:, None]

    rp = jnp.stack(out[2:], axis=-1)[jnp.minimum(pos, NK - 1)]
    r, p = rp[..., :3], rp[..., 3:]
    center = _cell_centers(geom, st.r.dtype)
    r = jnp.where(valid[..., None], r, center)
    p = jnp.where(valid[..., None], p, 0.0)
    return BinnedState(r=r, p=p, valid=valid), load


# Migration strategy (resolved at import per the jit-cache rule —
# trace-time env reads are invisible to the cache key):
#   neighbor    dimension-split neighbor exchange (ops/neighbor_rebin):
#               3 axis passes of extract-kernel + mover-buffer rolls +
#               place-kernel; falls back to the global sort in-graph
#               (lax.cond) when any particle moved more than one cell
#               along an axis.  f32 speed path only (the f64 parity
#               path and x64 mode keep the global sort).  Default:
#               measured 26.5 ms vs the global sort's 38.7 ms at the
#               32^3 x 50ppc bench shape on v5e.
#   global      the [G*K] payload sort above
#   auto        mover extraction, with an in-graph lax.cond fallback to
#               the global sort when the mover buffer would overflow
#   incremental mover extraction only (overflow counts as dropped)
#
# Measured on v5e at the 32³×50ppc bench shape (benchmarks/
# profile_rebin*.py): global 36.6 ms, mover extraction 53.6 ms even at
# a 6% mover fraction — computed-index gathers cost ~13-17 ms flat and
# searchsorted ~40 ms on this backend, so any extract/merge scheme pays
# more in data movement than the variadic sort saves in passes.  The
# incremental path stays as an opt-in for backends with cheaper
# gathers.
_REBIN_MODE = os.environ.get("XPIC_REBIN", "neighbor")
# Static caps of the incremental path.  The mover buffer holds up to
# NK/_MOVER_DIV slots; at most _A_MAX arrivals land per cell per step
# (Poisson tails at ~100 ppc need ~K/4; overflow is a counted drop,
# raised loudly by the schemes' check_load).
_MOVER_DIV = int(os.environ.get("XPIC_REBIN_MOVER_DIV", "8"))
_A_MAX = int(os.environ.get("XPIC_REBIN_AMAX", "32"))


def _mover_cap(nk: int) -> int:
    return min(nk, max(128, -(-nk // _MOVER_DIV // 128) * 128))


def _rebin_incremental(st: BinnedState, geom: Geometry):
    """Mover-extraction migration: sort only the cell-changers.

    In the physical regime both this framework and the reference target
    (v·dt ≲ dx, checked by the CFL guard), ~90% of particles stay in
    their cell every step, so the global [G*K] payload sort of
    :func:`_rebin_global` (measured 38 ms at the 32³×50ppc bench shape,
    46% of the ECSIM step) mostly moves data that does not move.  This
    path does the reference's ``update_cells`` (which splices only the
    escaped points between per-cell lists,
    src/interfaces/particles.cpp:79-112) with static shapes:

    1. one *per-row* K-wide sort partitions each cell into
       [stayers | movers | dead] (log²K passes, not log²(GK));
    2. the movers are packed into an [M]-row buffer (M = NK/8 by
       default) with one gather, and only that buffer is globally
       sorted by destination cell;
    3. arrivals are merged into the **tail** slots of their destination
       row (arrival rank q → column K-1-q), which makes the merge a
       static-columns select — no per-row scatter.

    Rows are therefore [stayers.. | holes | ..arrivals]; every kernel
    already masks by ``valid``, and the next step's per-row sort
    re-compacts.  Deterministic and decomposition-independent: mover
    order is (destination, source-cell, source-slot).

    Returns ``(state, load)`` like :func:`_rebin_global`; movers beyond
    the buffer cap or beyond ``_A_MAX`` arrivals into one cell count as
    ``dropped`` (the schemes already raise on ``dropped > 0`` at their
    host sync point; ``XPIC_REBIN=global`` is the escape hatch).
    """
    G, K = st.valid.shape
    NK = G * K
    M = _mover_cap(NK)
    A = min(K, max(_A_MAX, K // 4))
    ids = state_cell_ids(st, geom)  # [G, K], dead -> G
    home = jnp.arange(G, dtype=jnp.int32)[:, None]
    stay = st.valid & (ids == home)
    move = st.valid & ~stay & (ids < G)

    # 1. per-row partition: stayers first, movers next, dead last.
    key = jnp.where(stay, 0, jnp.where(move, 1, 2)).astype(jnp.int32)
    k_col = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None, :], (G, K))
    out = jax.lax.sort(
        (key, k_col,
         st.r[..., 0], st.r[..., 1], st.r[..., 2],
         st.p[..., 0], st.p[..., 1], st.p[..., 2]),
        num_keys=2, dimension=1)
    key_s = out[0]
    r_s = jnp.stack(out[2:5], axis=-1)
    p_s = jnp.stack(out[5:8], axis=-1)
    s = jnp.sum(key_s == 0, axis=1).astype(jnp.int32)  # stayers per cell
    m = jnp.sum(key_s == 1, axis=1).astype(jnp.int32)  # movers per cell

    # 2. pack movers (one gather of M rows; cost scales with M, not NK).
    moff = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(m).astype(jnp.int32)])
    total_m = moff[-1]
    i = jnp.arange(M, dtype=jnp.int32)
    src_g = (jnp.searchsorted(moff, i, side="right").astype(jnp.int32) - 1)
    src_g = jnp.clip(src_g, 0, G - 1)
    src_k = s[src_g] + (i - moff[src_g])
    packed = jnp.concatenate([r_s, p_s], axis=-1).reshape(NK, 6)
    buf = packed[jnp.clip(src_g * K + src_k, 0, NK - 1)]  # [M, 6]
    in_buf = i < total_m

    # destination ids recomputed from the gathered positions (avoids a
    # second int gather; positions are already boundary-wrapped).
    n3 = jnp.asarray([geom.nx, geom.ny, geom.nz], jnp.int32)
    c = jnp.clip(jnp.floor(buf[:, :3]).astype(jnp.int32), 0, n3 - 1)
    dest = (c[:, 2] * geom.ny + c[:, 1]) * geom.nx + c[:, 0]
    dest = jnp.where(in_buf, dest, G).astype(jnp.int32)

    # 3. sort only the buffer; merge arrivals into tail columns.
    bout = jax.lax.sort(
        (dest, i, buf[:, 0], buf[:, 1], buf[:, 2],
         buf[:, 3], buf[:, 4], buf[:, 5]),
        num_keys=2)
    dest_s = bout[0]
    buf_s = jnp.stack(bout[2:], axis=-1)  # [M, 6]
    aoff = jnp.searchsorted(dest_s, jnp.arange(G + 1, dtype=jnp.int32)
                            ).astype(jnp.int32)
    a = aoff[1:] - aoff[:G]  # captured arrivals per cell

    qs = jnp.arange(A, dtype=jnp.int32)[None, :]
    okq = (qs < a[:, None]) & ((K - 1 - qs) >= s[:, None])  # [G, A]
    blk = buf_s[jnp.clip((aoff[:G, None] + qs).reshape(-1), 0, M - 1)]
    blk = blk.reshape(G, A, 6)[:, ::-1, :]  # arrival q at column K-1-q
    okq_r = okq[:, ::-1]

    center = _cell_centers(geom, st.r.dtype)
    valid_stay = k_col < s[:, None]
    r_new = jnp.where(valid_stay[..., None], r_s, center)
    p_new = jnp.where(valid_stay[..., None], p_s, 0.0)
    r_new = jnp.concatenate(
        [r_new[:, : K - A],
         jnp.where(okq_r[..., None], blk[..., :3], r_new[:, K - A:])], axis=1)
    p_new = jnp.concatenate(
        [p_new[:, : K - A],
         jnp.where(okq_r[..., None], blk[..., 3:], p_new[:, K - A:])], axis=1)
    valid_new = jnp.concatenate(
        [valid_stay[:, : K - A], valid_stay[:, K - A:] | okq_r], axis=1)

    accepted = jnp.sum(okq, axis=1)
    dropped = total_m - jnp.sum(accepted)
    load = jnp.stack([jnp.max(s + a), dropped, total_m]).astype(jnp.int32)
    return BinnedState(r=r_new, p=p_new, valid=valid_new), load


def _pallas_interpret() -> bool:
    try:
        return jax.devices()[0].platform not in ("tpu", "axon")
    except Exception:  # pragma: no cover - no backend at all
        return True


def _rebin_neighbor_guarded(st: BinnedState, geom: Geometry, mesh=None):
    """Neighbor exchange with an in-graph fallback to the global sort
    (the reference's 26-neighbor exchange has the same reach,
    src/interfaces/particles.cpp:118-248).  The guard is EXACT for the
    dimension-split exchange: ``neighbor_guard_stats`` simulates the
    buffer routing at the counting level — including the occupancy of
    movers *in transit* through a cell's buffer between the axis
    passes, which can overflow even when every origin-cell count is in
    bounds — so any step the exchange could not route losslessly takes
    the global sort instead: one slow step, never dropped particles.
    (A post-check on the exchange's own dropped count was tried first
    and rejected: nesting the fallback ``lax.cond`` around the
    exchange keeps the full pre-exchange payload alive across it and
    cost ~15 ms/step at the bench shape.)  Genuine K-capacity overflow
    (a destination cell beyond its slot budget) drops in both paths
    identically and still raises in the schemes."""
    from .neighbor_rebin import neighbor_guard_stats, rebin_neighbor

    interp = _pallas_interpret()
    # Mosaic on the current TPU toolchain cannot legalize kernels traced
    # under jax_enable_x64 (64-bit index types; measured: even a trivial
    # pallas_call fails) — but the interpreter can, which is what gives
    # the CPU test suite real coverage of this path.  Under a mesh the
    # kernels run per-shard via shard_map (pl.pallas_call has no SPMD
    # rule); without an explicit mesh, multi-device processes keep the
    # global sort.
    multi_dev = mesh is None and len(jax.devices()) > 1
    if multi_dev:
        # Eager calls carry concrete placement: a state living on one
        # device is safe for the no-mesh Pallas path even when more
        # devices exist (the 8-virtual-device test config).  Tracers
        # (production jit) keep the conservative device-count check.
        try:
            multi_dev = len(st.r.sharding.device_set) > 1
        except Exception:
            pass
    if (st.r.dtype != jnp.float32
            or (jax.config.jax_enable_x64 and not interp)
            or multi_dev):
        return _rebin_global(st, geom)
    # One pass over the state yields both the guard condition and the
    # exchange statistics the neighbor path reports (XLA fuses the
    # reductions; recomputing them inside rebin_neighbor would read the
    # full payload a second time).
    ok, moved, n_before = neighbor_guard_stats(st, geom)
    return jax.lax.cond(
        ok,
        lambda s: rebin_neighbor(s, geom, mesh=mesh, interpret=interp,
                                 stats=(moved, n_before)),
        lambda s: _rebin_global(s, geom),
        st,
    )


def _rebin_core(st: BinnedState, geom: Geometry, mesh=None):
    """Per-step migration with the strategy picked by ``XPIC_REBIN``."""
    if _REBIN_MODE == "neighbor":
        return _rebin_neighbor_guarded(st, geom, mesh)
    if _REBIN_MODE == "global":
        return _rebin_global(st, geom)
    if _REBIN_MODE == "incremental":
        return _rebin_incremental(st, geom)
    # auto: mover extraction unless the buffer would overflow this step
    ids = state_cell_ids(st, geom)
    home = jnp.arange(st.n_cells, dtype=jnp.int32)[:, None]
    total_m = jnp.sum(st.valid & (ids != home) & (ids < st.n_cells))
    fits = total_m <= _mover_cap(st.n_cells * st.slots)
    return jax.lax.cond(
        fits,
        lambda s_: _rebin_incremental(s_, geom),
        lambda s_: _rebin_global(s_, geom),
        st,
    )


@partial(jax.jit, static_argnames=("geom", "mesh"), donate_argnums=(0,))
def rebin(st: BinnedState, geom: Geometry, mesh=None) -> BinnedState:
    """:func:`_rebin_core` without the occupancy info (XLA removes the
    dead reductions); overflow beyond K slots in a cell is *dropped* —
    use :func:`rebin_checked` when capacity is in doubt."""
    return _rebin_core(st, geom, mesh)[0]


@partial(jax.jit, static_argnames=("geom", "mesh"), donate_argnums=(0,))
def rebin_checked(st: BinnedState, geom: Geometry, mesh=None):
    """:func:`rebin` plus the occupancy
    ``load = [max_per_cell, dropped, moved]``.

    The schemes check ``dropped == 0`` at their existing host sync point
    (the solver-convergence fetch) and use ``max_per_cell`` to grow K
    proactively — the TPU counterpart of the reference's unbounded
    ``std::list`` cells, which can never overflow
    (src/interfaces/particles.h:32).
    """
    return _rebin_core(st, geom, mesh)


def wrap_state(st: BinnedState, geom: Geometry) -> BinnedState:
    """Apply the global coordinate boundaries (periodic wrap / open kill)
    to possibly-out-of-domain positions without moving the particles.
    Plain (unjitted) — composes inside the scheme kernels."""
    return _drift_impl(st, geom, 0.0)


def migrate_checked(st: BinnedState, geom: Geometry, mesh=None):
    """Boundary map + checked rebin: the full per-step migration.
    Plain (unjitted) — composes inside the scheme kernels."""
    return _rebin_core(wrap_state(st, geom), geom, mesh)


def kinetic_energy_state(st: BinnedState, m_mpw: float) -> jax.Array:
    """0.5 * m * mpw * sum |p|^2 over live slots (Energy::get_kinetic,
    src/diagnostics/energy.cpp:215-218)."""
    w = jnp.where(st.valid, jnp.sum(st.p * st.p, axis=-1), 0.0)
    return 0.5 * m_mpw * jnp.sum(w)


@partial(jax.jit, static_argnames=("geom",))
def rebin_overflow(st: BinnedState, geom: Geometry) -> jax.Array:
    """Number of live particles that a :func:`rebin` would drop because
    their destination cell is already at slot capacity."""
    G, K = st.valid.shape
    ids = state_cell_ids(st, geom).reshape(-1)
    counts = jnp.zeros(G + 1, jnp.int32).at[ids].add(1)
    return jnp.sum(jnp.maximum(counts[:G] - K, 0))


def _drift_impl(st: BinnedState, geom: Geometry, dt: float | None = None
                ) -> BinnedState:
    """r += v dt in grid units, with the global coordinate boundaries
    (periodic wrap / reflective clamp+flip / open kill) applied
    (interfaces/point.cpp:3-26)."""
    d = jnp.asarray(geom.cell_steps, st.r.dtype)
    n = jnp.asarray([geom.nx, geom.ny, geom.nz], st.r.dtype)
    dt = geom.dt if dt is None else dt
    r = st.r + st.p * (dt / d)
    per = jnp.asarray([b == PERIODIC for b in geom.bounds])
    refl = jnp.asarray([b == REFLECTIVE for b in geom.bounds])
    r_wrap = jnp.where(r < 0.0, r + n, jnp.where(r > n, r - n, r))
    r_wrap = jnp.clip(r_wrap, 0.0, n)
    out = (r < 0.0) | (r > n)
    r_new = jnp.where(per[None, None, :], r_wrap, jnp.clip(r, 0.0, n))
    p_new = jnp.where(refl[None, None, :] & out, -st.p, st.p)
    dead = jnp.any(out & ~per[None, None, :] & ~refl[None, None, :],
                   axis=-1)
    return BinnedState(r=r_new, p=p_new, valid=st.valid & ~dead)


drift_state = partial(jax.jit, static_argnames=("geom",),
                      donate_argnums=(0,))(_drift_impl)


def bin_state(sp: ParticleArrays, geom: Geometry, slots: int) -> BinnedState:
    """Initial conversion flat -> persistent binned (init/checkpoint load)."""
    from ..particles import sort_by_cell_impl

    sp = sort_by_cell_impl(sp, geom)
    b = bin_sorted(sp, geom, slots)
    return BinnedState(r=b.r, p=b.p, valid=b.valid)


@partial(jax.jit, static_argnames=("geom",))
def unbin_state(st: BinnedState, geom: Geometry) -> ParticleArrays:
    """Flatten the binned state to a [G*K]-capacity flat species view
    (physical coordinates; dead padding masked) for diagnostics,
    checkpointing and the command layer."""
    G, K = st.valid.shape
    d = jnp.asarray(geom.cell_steps, st.r.dtype)
    return ParticleArrays(
        r=(st.r * d).reshape(G * K, 3),
        p=st.p.reshape(G * K, 3),
        alive=st.valid.reshape(G * K),
    )
