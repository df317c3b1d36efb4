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
