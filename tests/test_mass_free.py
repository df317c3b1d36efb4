"""Matrix-free mass apply == assembled block apply (ops/mass_free.py).

The f32 speed path applies matL without assembling it; these tests pin
the bilinear form to the assembled route (the f64 parity path) on
random states, plus the factored current deposit / field gather twins
and the trace shortcut that feeds the preconditioner shift.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xpic_tpu.config import Geometry
from xpic_tpu.ops.binning import bin_state
from xpic_tpu.ops.ecsim_blocks import (
    apply_blocks,
    assemble_blocks,
    deposit_slots,
    ecsim_particle_terms,
    gather_slot_fields,
    s1_slot_weights,
)
from xpic_tpu.ops.gather_scatter import cell_t
from xpic_tpu.ops.mass_free import (
    deposit_vector_slots,
    gather_vector_slots,
    mass_apply,
    mass_operands,
    mass_trace,
)
from xpic_tpu.particles import ParticleArrays


@pytest.fixture(scope="module")
def state():
    geom = Geometry(dx=0.5, dy=0.5, dz=0.5, dt=1.5, nx=6, ny=5, nz=4,
                    nt=1)
    rng = np.random.default_rng(7)
    n = geom.n_cells * 9
    sp = ParticleArrays(
        r=jnp.asarray(rng.random((n, 3)) * np.array(geom.L)),
        p=jnp.asarray(rng.standard_normal((n, 3)) * 0.1),
        alive=jnp.asarray(rng.random(n) < 0.85),
    )
    st = bin_state(sp, geom, 16)
    t = cell_t(geom, st.r)
    B_p = jnp.asarray(
        rng.standard_normal((geom.n_cells, 16, 3)) * 0.3)
    B_p = jnp.where(st.valid[..., None], B_p, 0.0)
    x = jnp.asarray(
        rng.standard_normal((3, geom.nz, geom.ny, geom.nx)))
    return geom, st, t, B_p, x


Q, M, MPW = -1.0, 1.0, 0.2


def _assembled(geom, st, t, B_p):
    W = s1_slot_weights(t)
    I_p, Mrot = ecsim_particle_terms(B_p, st.p, st.valid, q=Q, m=M,
                                     mpw=MPW, dt=geom.dt)
    return W, I_p, assemble_blocks(W, Mrot)


def test_mass_apply_matches_assembled(state):
    geom, st, t, B_p, x = state
    _, _, L = _assembled(geom, st, t, B_p)
    y_blocks = apply_blocks(L, x, geom)
    op = mass_operands(t, B_p, st.valid, q=Q, m=M, mpw=MPW, dt=geom.dt)
    y_free = mass_apply(x, [op], geom)
    np.testing.assert_allclose(np.asarray(y_free), np.asarray(y_blocks),
                               rtol=0, atol=1e-12)


def test_mass_apply_sums_species(state):
    geom, st, t, B_p, x = state
    op = mass_operands(t, B_p, st.valid, q=Q, m=M, mpw=MPW, dt=geom.dt)
    y1 = mass_apply(x, [op], geom)
    y2 = mass_apply(x, [op, op], geom)
    np.testing.assert_allclose(np.asarray(y2), 2 * np.asarray(y1),
                               rtol=1e-13, atol=1e-13)


def test_deposit_vector_slots_matches_W_route(state):
    geom, st, t, B_p, _ = state
    W, I_p, _ = _assembled(geom, st, t, B_p)
    cur_W = deposit_slots(I_p, W, geom)
    cur_free = deposit_vector_slots(I_p, t, geom)
    np.testing.assert_allclose(np.asarray(cur_free), np.asarray(cur_W),
                               rtol=0, atol=1e-12)


def test_gather_vector_slots_matches_W_route(state):
    geom, st, t, B_p, x = state
    W, _, _ = _assembled(geom, st, t, B_p)
    e_W = gather_slot_fields(x, W, geom)
    e_free = gather_vector_slots(x, t, geom)
    np.testing.assert_allclose(np.asarray(e_free), np.asarray(e_W),
                               rtol=0, atol=1e-12)


def test_mass_trace_matches_assembled(state):
    geom, st, t, B_p, _ = state
    _, _, L = _assembled(geom, st, t, B_p)
    tr_blocks = jnp.einsum("gcici->", L)
    op = mass_operands(t, B_p, st.valid, q=Q, m=M, mpw=MPW, dt=geom.dt)
    np.testing.assert_allclose(float(mass_trace(op)), float(tr_blocks),
                               rtol=1e-12)


def test_advance_phase_free_matches_blocks(state, monkeypatch):
    """The full fill+advance pipeline produces the same half-step field
    whether matL is assembled or applied matrix-free (f32, to the
    solver tolerance)."""
    import xpic_tpu.parallel.step as step_mod

    geom, st, t, B_p, x = state
    f32 = jnp.float32
    st32 = type(st)(r=st.r.astype(f32), p=st.p.astype(f32),
                    valid=st.valid)
    t32 = cell_t(geom, st32.r)
    rng = np.random.default_rng(3)
    shape = (3, geom.nz, geom.ny, geom.nx)
    E = jnp.asarray(rng.standard_normal(shape) * 1e-3, f32)
    B = jnp.asarray(rng.standard_normal(shape) * 1e-2, f32)
    B0 = jnp.zeros(shape, f32)

    outs = {}
    for mode in ("blocks", "free"):
        monkeypatch.setattr(step_mod, "_MASS_MODE", mode)
        currI, mass, W, B_pg = step_mod.fill_phase(
            B, st32, t32, geom, q=Q, m=M, mpw=MPW)
        assert isinstance(mass, tuple) == (mode == "free")
        acc = step_mod.accumulate_mass(None, mass)
        sol, _rhs = step_mod.advance_phase(E, B, B0, currI, acc, geom,
                                           tol=1e-7, maxit=200)
        assert bool(sol.converged)
        outs[mode] = np.asarray(sol.x)
    np.testing.assert_allclose(outs["free"], outs["blocks"],
                               rtol=0, atol=1e-5)


def test_mass_apply_is_jittable(state):
    geom, st, t, B_p, x = state
    op = mass_operands(t, B_p, st.valid, q=Q, m=M, mpw=MPW, dt=geom.dt)
    f = jax.jit(lambda x, op: mass_apply(x, [op], geom))
    y = f(x, op)
    # jit fusion may reassociate the slot sums — roundoff-level only.
    np.testing.assert_allclose(np.asarray(y),
                               np.asarray(mass_apply(x, [op], geom)),
                               rtol=0, atol=1e-13)


def test_mass_apply_pallas_matches_xla(state):
    """The fused Pallas mass apply (ops/pallas_mass, interpret mode
    off-TPU) must reproduce the XLA factored-hat chain on the same
    packed operands."""
    from xpic_tpu.ops.ecsim_blocks import gather_slots
    from xpic_tpu.ops.mass_free import (
        _axis_hats_planes,
        _component_factors,
        _deposit_component,
        _gather_component,
        _rotate,
    )
    from xpic_tpu.ops.pallas_mass import mass_apply_slots_pallas

    geom, st, t, B_p, x = state
    op = mass_operands(t, B_p, st.valid, q=Q, m=M, mpw=MPW, dt=geom.dt)
    P = jnp.asarray(op.packed, jnp.float32)
    xg = jnp.asarray(gather_slots(x, geom), jnp.float32)

    wn, ws = _axis_hats_planes((P[:, 0], P[:, 1], P[:, 2]))
    comps = _component_factors(wn, ws)
    u = tuple(_gather_component(xg[:, c], *comps[c]) for c in range(3))
    y = _rotate(u, (P[:, 3], P[:, 4], P[:, 5]), P[:, 6])
    ref = np.asarray(jnp.stack(
        [_deposit_component(y[c], *comps[c]) for c in range(3)], axis=1))

    got = np.asarray(mass_apply_slots_pallas(xg, P, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5,
                               atol=1e-6 * np.abs(ref).max())
