"""Mover-extraction migration vs the global payload sort.

The incremental path must reproduce the reference's ``update_cells``
semantics exactly (same particles in the same cells after migration,
src/interfaces/particles.cpp:79-112) — only the slot order inside a
cell may differ from the global sort's.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from xpic_tpu.config import Geometry
from xpic_tpu.ops import binning as B
from xpic_tpu.particles import ParticleArrays


def _geom():
    return Geometry(dx=0.5, dy=0.5, dz=0.5, dt=1.5, nx=8, ny=8, nz=8, nt=1)


def _state(geom, vth, slots=40, seed=3):
    rng = np.random.default_rng(seed)
    n = geom.n_cells * 20
    sp = ParticleArrays(
        r=jnp.asarray(rng.random((n, 3)) * np.array(geom.L)),
        p=jnp.asarray(rng.standard_normal((n, 3)) * vth),
        alive=jnp.ones(n, bool),
    )
    return B.bin_state(sp, geom, slots)


def _cell_sets(st, geom):
    """Per-cell multisets of (r, p) rows, slot-order independent."""
    r, p, v = (np.asarray(a) for a in (st.r, st.p, st.valid))
    G, K = v.shape
    return {
        g: sorted(
            tuple(np.round(np.concatenate([r[g, k], p[g, k]]), 12))
            for k in range(K) if v[g, k]
        )
        for g in range(G)
    }


def test_incremental_matches_global_over_steps(monkeypatch):
    monkeypatch.setattr(B, "_REBIN_MODE", "auto")
    geom = _geom()
    st = _state(geom, vth=0.014)
    for _ in range(3):
        st = B._drift_impl(st, geom)
        s_glob, l_glob = B._rebin_global(st, geom)
        s_inc, l_inc = B._rebin_incremental(st, geom)
        s_auto, l_auto = B._rebin_core(st, geom)
        assert int(l_glob[1]) == int(l_inc[1]) == int(l_auto[1]) == 0
        assert int(l_glob[0]) == int(l_inc[0]) == int(l_auto[0])
        ref = _cell_sets(s_glob, geom)
        assert _cell_sets(s_inc, geom) == ref
        assert _cell_sets(s_auto, geom) == ref
        st = s_inc


def test_auto_falls_back_on_hot_state(monkeypatch):
    """When most particles change cell, the mover buffer overflows and
    the auto dispatcher must route to the global sort, not drop."""
    monkeypatch.setattr(B, "_REBIN_MODE", "auto")
    geom = _geom()
    st = B._drift_impl(_state(geom, vth=2.0), geom)
    ids = B.state_cell_ids(st, geom)
    home = jnp.arange(geom.n_cells, dtype=jnp.int32)[:, None]
    movers = int(jnp.sum(st.valid & (ids != home) & (ids < geom.n_cells)))
    assert movers > B._mover_cap(geom.n_cells * st.slots)
    s_glob, l_glob = B._rebin_global(st, geom)
    s_auto, l_auto = B._rebin_core(st, geom)
    assert int(l_auto[1]) == int(l_glob[1])
    assert _cell_sets(s_auto, geom) == _cell_sets(s_glob, geom)


def test_forced_incremental_reports_buffer_overflow_as_dropped():
    geom = _geom()
    st = B._drift_impl(_state(geom, vth=2.0), geom)
    _, load = B._rebin_incremental(st, geom)
    assert int(load[1]) > 0  # loud, never silent loss


def test_load_reports_moved_count():
    """load[2] must equal the number of particles that changed cell
    (the reference's per-exchange statistics,
    interfaces/particles.cpp:227-246)."""
    geom = _geom()
    st = B._drift_impl(_state(geom, vth=0.014), geom)
    ids = np.asarray(B.state_cell_ids(st, geom))
    home = np.arange(geom.n_cells)[:, None]
    expected = int(
        ((ids != home) & (ids < geom.n_cells) & np.asarray(st.valid)).sum()
    )
    _, l_glob = B._rebin_global(st, geom)
    _, l_inc = B._rebin_incremental(st, geom)
    assert int(l_glob[2]) == expected > 0
    assert int(l_inc[2]) == expected


def test_species_log_distribution_runs(caplog):
    import logging
    from xpic_tpu.config import SortParameters
    from xpic_tpu.particles import ParticleArrays
    from xpic_tpu.schemes.base import Species

    geom = _geom()
    rng = np.random.default_rng(0)
    n = 64
    sp = Species(
        SortParameters(sort_name="e", Np=1, n=1.0, q=-1.0, m=1.0),
        ParticleArrays(
            r=jnp.asarray(rng.random((n, 3)) * np.array(geom.L)),
            p=jnp.asarray(rng.standard_normal((n, 3)) * 0.1),
            alive=jnp.ones(n, bool),
        ),
        geom,
    )
    with caplog.at_level(logging.DEBUG, logger="xpic"):
        sp.log_distribution()
    assert "velocity distribution histogram" in caplog.text
    # every live particle lands in exactly one bin per axis
    counts = [
        sum(int(w) for w in rec.getMessage().split()[-3:])
        for rec in caplog.records
        if rec.getMessage().strip()[:1].isdigit()
    ]
    assert sum(counts) == 3 * n


def test_arrival_tail_slots_hold_centers_when_invalid():
    """Invalid slots must park at the cell center (finite weights)."""
    geom = _geom()
    st = B._drift_impl(_state(geom, vth=0.014), geom)
    s_inc, _ = B._rebin_incremental(st, geom)
    centers = np.asarray(B._cell_centers(geom, s_inc.r.dtype))[:, 0, :]
    r, v = np.asarray(s_inc.r), np.asarray(s_inc.valid)
    bad = ~v[..., None] & (r != centers[:, None, :])
    assert not bad.any()
    assert np.all(np.asarray(s_inc.p)[~v] == 0.0)


# -- neighbor-exchange migration (ops/neighbor_rebin) -----------------------


def _state32(geom, vth, slots=40, seed=3, ppc=20):
    rng = np.random.default_rng(seed)
    n = geom.n_cells * ppc
    sp = ParticleArrays(
        r=jnp.asarray(rng.random((n, 3)) * np.array(geom.L), jnp.float32),
        p=jnp.asarray(rng.standard_normal((n, 3)) * vth, jnp.float32),
        alive=jnp.ones(n, bool),
    )
    return B.bin_state(sp, geom, slots)


def test_neighbor_matches_global_over_steps():
    """The dimension-split neighbor exchange reproduces the global sort's
    per-cell multisets and load stats exactly (the reference's
    update_cells semantics, src/interfaces/particles.cpp:79-112)."""
    from xpic_tpu.ops.neighbor_rebin import far_mover_count

    geom = Geometry(dx=0.5, dy=0.5, dz=0.5, dt=1.5, nx=8, ny=6, nz=4, nt=1)
    st = _state32(geom, vth=0.05)
    for _ in range(3):
        st = B._drift_impl(st, geom)
        assert int(far_mover_count(st, geom)) == 0
        s_glob, l_glob = B._rebin_global(st, geom)
        s_nb, l_nb = B._rebin_neighbor_guarded(st, geom)
        assert [int(v) for v in np.asarray(l_glob)] == \
               [int(v) for v in np.asarray(l_nb)]
        assert _cell_sets(s_nb, geom) == _cell_sets(s_glob, geom)
        st = s_nb


def test_neighbor_falls_back_on_far_movers():
    """Hot particles that jump more than one cell must route to the
    global sort inside the guarded dispatcher — never silently drop."""
    from xpic_tpu.ops.neighbor_rebin import far_mover_count

    geom = _geom()
    st = B._drift_impl(_state32(geom, vth=2.0), geom)
    assert int(far_mover_count(st, geom)) > 0
    s_glob, l_glob = B._rebin_global(st, geom)
    s_nb, l_nb = B._rebin_neighbor_guarded(st, geom)
    assert [int(v) for v in np.asarray(l_glob)] == \
           [int(v) for v in np.asarray(l_nb)]
    assert _cell_sets(s_nb, geom) == _cell_sets(s_glob, geom)


def test_neighbor_open_boundaries_and_f64_route():
    """Open (non-periodic) boundaries: killed particles vanish from both
    paths identically; f64 states take the global path (structure
    parity of the guarded dispatcher)."""
    geom = Geometry(dx=0.5, dy=0.5, dz=0.5, dt=1.5, nx=6, ny=6, nz=6,
                    nt=1, bounds=("open", "periodic", "open"))
    st = _state32(geom, vth=0.3)
    st = B._drift_impl(st, geom)
    s_glob, l_glob = B._rebin_global(st, geom)
    s_nb, l_nb = B._rebin_neighbor_guarded(st, geom)
    assert [int(v) for v in np.asarray(l_glob)] == \
           [int(v) for v in np.asarray(l_nb)]
    assert _cell_sets(s_nb, geom) == _cell_sets(s_glob, geom)

    # f64 (parity path) routes to the global sort and keeps the contract
    st64 = B._drift_impl(_state(geom, vth=0.05), geom)
    s64, l64 = B._rebin_neighbor_guarded(st64, geom)
    sg64, lg64 = B._rebin_global(st64, geom)
    assert _cell_sets(s64, geom) == _cell_sets(sg64, geom)


def test_neighbor_invalid_slots_hold_centers():
    geom = _geom()
    st = B._drift_impl(_state32(geom, vth=0.05), geom)
    s_nb, _ = B._rebin_neighbor_guarded(st, geom)
    centers = np.asarray(B._cell_centers(geom, s_nb.r.dtype))[:, 0, :]
    r, v = np.asarray(s_nb.r), np.asarray(s_nb.valid)
    bad = ~v[..., None] & (r != centers[:, None, :])
    assert not bad.any()
    assert np.all(np.asarray(s_nb.p)[~v] == 0.0)


def test_guarded_dispatcher_takes_neighbor_branch(monkeypatch):
    """Under the suite config (x64 + CPU) the guarded dispatcher must
    actually run the neighbor exchange in interpret mode — not compare
    the global sort against itself (round-3 advisor medium finding:
    the rewritten exchange shipped with zero CI coverage)."""
    from xpic_tpu.ops import neighbor_rebin as NR

    calls = []
    real = NR.rebin_neighbor

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(NR, "rebin_neighbor", spy)

    geom = Geometry(dx=0.5, dy=0.5, dz=0.5, dt=1.5, nx=8, ny=6, nz=4, nt=1)
    st = B._drift_impl(_state32(geom, vth=0.01, seed=7), geom)
    ok, _, _ = NR.neighbor_guard_stats(st, geom)
    assert bool(ok)
    s_raw, l_raw = real(st, geom, interpret=True)
    assert int(l_raw[1]) == 0

    s_g, l_g = B._rebin_neighbor_guarded(st, geom)
    assert calls, "dispatcher skipped the neighbor path entirely"
    # The guarded output is bitwise the raw neighbor output (stayer
    # prefix + tail-merged arrivals), not the global sort's compacted
    # rows — proof the cond took the neighbor branch at runtime.
    assert np.array_equal(np.asarray(s_g.valid), np.asarray(s_raw.valid))
    assert np.array_equal(np.asarray(s_g.r), np.asarray(s_raw.r))
    assert np.array_equal(np.asarray(s_g.p), np.asarray(s_raw.p))
    s_glob, _ = B._rebin_global(st, geom)
    assert _cell_sets(s_g, geom) == _cell_sets(s_glob, geom)


def test_guarded_recovers_from_transit_overflow():
    """Round-3 advisor high finding: every per-origin count is in
    bounds but a cell's mover buffer overflows mid-exchange from movers
    in transit out of up to 3 neighboring source cells.  The exact
    guard must predict this (ok=False) and route the step to the global
    sort (one slow step) instead of losing particles and crashing a
    CFL-respecting run.

    Construction (dt=1, dx=1, K=40 so AT=16, A=8): target cell T gets
    8 resident movers (+y only; they sit in T's buffer through the x
    pass) plus 8 arrivals from T-x (moving +x,+y) and 8 from T+x
    (moving -x,+y) — per-origin counts all within bounds, but T's
    buffer holds 24 > AT = 16 after the x pass."""
    from xpic_tpu.ops import neighbor_rebin as NR

    geom = Geometry(dx=1.0, dy=1.0, dz=1.0, dt=1.0, nx=8, ny=6, nz=4, nt=1)
    tx, ty, tz = 4, 2, 1
    rows, vels = [], []
    for x0, vx in ((tx, 0.0), (tx - 1, 1.0), (tx + 1, -1.0)):
        for k in range(8):
            rows.append([x0 + 0.5, ty + 0.3 + 0.02 * k, tz + 0.5])
            vels.append([vx, 1.0, 0.0])
    sp = ParticleArrays(
        r=jnp.asarray(np.array(rows), jnp.float32),
        p=jnp.asarray(np.array(vels), jnp.float32),
        alive=jnp.ones(len(rows), bool),
    )
    st = B._drift_impl(B.bin_state(sp, geom, 40), geom)

    # Every per-origin bound holds (the old, insufficient guard):
    ids = B.state_cell_ids(st, geom)
    home = jnp.arange(geom.n_cells, dtype=jnp.int32)[:, None]
    leavers = jnp.sum(st.valid & (ids != home), axis=1)
    assert int(jnp.max(leavers)) <= NR._buffer_cols(40)

    # The raw exchange would drop in transit; the exact guard sees it:
    _, l_raw = NR.rebin_neighbor(st, geom, interpret=True)
    assert int(l_raw[1]) > 0, "raw exchange must exhibit the transit overflow"
    ok, _, _ = NR.neighbor_guard_stats(st, geom)
    assert not bool(ok), "exact guard must predict the transit overflow"

    s_g, l_g = B._rebin_neighbor_guarded(st, geom)
    s_glob, l_glob = B._rebin_global(st, geom)
    assert int(l_g[1]) == 0
    assert [int(v) for v in np.asarray(l_g)] == \
           [int(v) for v in np.asarray(l_glob)]
    assert _cell_sets(s_g, geom) == _cell_sets(s_glob, geom)


def test_exact_guard_is_tight_both_ways():
    """The guard must (a) pass ordinary CFL-regime drift steps — at the
    bench's thermal velocity every step takes the fast path — and (b)
    agree with the raw exchange's dropped count in both directions over
    a hot migration storm: ok=True iff the exchange routes losslessly
    (modulo genuine K-capacity overflow, absent at these fills)."""
    from xpic_tpu.ops import neighbor_rebin as NR

    # (a) bench regime (v dt/dx ~ 4%): never reject
    geom = Geometry(dx=0.5, dy=0.5, dz=0.5, dt=1.5, nx=8, ny=6, nz=4, nt=1)
    st = _state32(geom, vth=0.014, seed=11)
    for _ in range(3):
        st = B._drift_impl(st, geom)
        ok, _, _ = NR.neighbor_guard_stats(st, geom)
        assert bool(ok), "guard rejects an ordinary thermal drift step"
        st, load = B._rebin_neighbor_guarded(st, geom)
        assert int(load[1]) == 0

    # (b) hot storm (v dt/dx ~ 15%): guard verdict == exchange outcome
    st = _state32(geom, vth=0.05, seed=11)
    rejected = 0
    for _ in range(4):
        st = B._drift_impl(st, geom)
        ok, _, _ = NR.neighbor_guard_stats(st, geom)
        _, l_raw = NR.rebin_neighbor(st, geom, interpret=True)
        assert bool(ok) == (int(l_raw[1]) == 0)
        rejected += not bool(ok)
        st, _ = B._rebin_global(st, geom)
    assert rejected > 0, "storm never stressed the guard - weaken vth?"


def test_full_axis_traversal_is_far_on_nonperiodic_axes():
    """A d == n-1 move is a one-cell wrap only on periodic axes; on a
    reflective axis it must be classified far (global-sort path), never
    periodic-wrapped by the extract kernel (round-3 advisor finding)."""
    import dataclasses

    from xpic_tpu.ops import neighbor_rebin as NR

    for bounds, far_expected in (
        (("reflective", "periodic", "periodic"), True),
        (("periodic", "periodic", "periodic"), False),
    ):
        geom = Geometry(dx=1.0, dy=1.0, dz=1.0, dt=1.0, nx=6, ny=4, nz=4,
                        nt=1, bounds=bounds)
        sp = ParticleArrays(
            r=jnp.asarray([[0.5, 1.5, 1.5]], jnp.float32),
            p=jnp.zeros((1, 3), jnp.float32),
            alive=jnp.ones(1, bool),
        )
        st = B.bin_state(sp, geom, 8)
        # Teleport the particle across the whole x axis without drifting
        # (unreachable under CFL motion, but reflective walls keep such
        # states alive where open bounds killed them).
        r2 = st.r.at[:, :, 0].set(
            jnp.where(st.valid, geom.nx - 0.5, st.r[:, :, 0]))
        st2 = dataclasses.replace(st, r=r2)
        far = int(NR.far_mover_count(st2, geom))
        ok, _, _ = NR.neighbor_guard_stats(st2, geom)
        if far_expected:
            assert far > 0 and not bool(ok)
        else:
            assert far == 0 and bool(ok)
        s_g, l_g = B._rebin_neighbor_guarded(st2, geom)
        s_glob, l_glob = B._rebin_global(st2, geom)
        assert [int(v) for v in np.asarray(l_g)] == \
               [int(v) for v in np.asarray(l_glob)]
        assert _cell_sets(s_g, geom) == _cell_sets(s_glob, geom)
