"""Pallas ECSIM fill kernel vs the XLA einsum reference path.

Runs in interpreter mode on the CPU test mesh; on TPU the same kernel
compiles via Mosaic.  Tolerances are f32 (the kernel is the speed path;
f64 parity runs keep the einsum route).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xpic_tpu.config import Geometry
from xpic_tpu.ops.binning import bin_sorted
from xpic_tpu.ops.ecsim_blocks import (assemble_blocks, deposit_slot_sums,
                                       deposit_slots, ecsim_particle_terms,
                                       s1_slot_weights)
from xpic_tpu.ops.gather_scatter import B_STAGGER, cell_t, gather_vector
from xpic_tpu.ops.pallas_ecsim import ecsim_fill_pallas
from xpic_tpu.particles import ParticleArrays, sort_by_cell


@pytest.fixture(scope="module")
def setup():
    geom = Geometry(dx=0.5, dy=0.5, dz=0.5, dt=1.5, nx=4, ny=4, nz=4, nt=1)
    rng = np.random.default_rng(3)
    n = geom.n_cells * 7
    r = rng.random((n, 3)) * np.array(geom.L)
    p = rng.standard_normal((n, 3)) * 0.1
    alive = rng.random(n) > 0.1
    sp = ParticleArrays(
        r=jnp.asarray(r, jnp.float32),
        p=jnp.asarray(p, jnp.float32),
        alive=jnp.asarray(alive),
    )
    sp = sort_by_cell(sp, geom)
    binned = bin_sorted(sp, geom, 16)
    t = cell_t(geom, binned.r).astype(jnp.float32)
    B = jnp.asarray(rng.standard_normal((3, 4, 4, 4)), jnp.float32)
    B_p = gather_vector(B, t, binned.valid, geom, order=1, width=3,
                        anchor=-1, stagger=B_STAGGER).astype(jnp.float32)
    return geom, binned, t, B_p


Q, M, MPW, DT = -1.0, 1.0, 0.25, 1.5


def test_blocks_match_einsum(setup):
    geom, binned, t, B_p = setup
    W = s1_slot_weights(t)
    I_p, Mten = ecsim_particle_terms(B_p, binned.p.astype(jnp.float32),
                                     binned.valid, q=Q, m=M, mpw=MPW, dt=DT)
    L_ref = assemble_blocks(W.astype(jnp.float32), Mten.astype(jnp.float32))

    L, Islot = ecsim_fill_pallas(t, binned.p.astype(jnp.float32), B_p,
                                 binned.valid, q=Q, m=M, mpw=MPW, dt=DT,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(L), np.asarray(L_ref),
                               rtol=2e-5, atol=2e-6)


def test_current_matches_deposit(setup):
    geom, binned, t, B_p = setup
    W = s1_slot_weights(t)
    I_p, _ = ecsim_particle_terms(B_p, binned.p.astype(jnp.float32),
                                  binned.valid, q=Q, m=M, mpw=MPW, dt=DT)
    currI_ref = deposit_slots(I_p.astype(jnp.float32),
                              W.astype(jnp.float32), geom)

    _, Islot = ecsim_fill_pallas(t, binned.p.astype(jnp.float32), B_p,
                                 binned.valid, q=Q, m=M, mpw=MPW, dt=DT,
                                 interpret=True)
    currI = deposit_slot_sums(Islot, geom)
    np.testing.assert_allclose(np.asarray(currI), np.asarray(currI_ref),
                               rtol=2e-5, atol=2e-6)


def test_gather_matches_slot_fields(setup):
    from xpic_tpu.ops.ecsim_blocks import gather_slot_fields, gather_slots
    from xpic_tpu.ops.pallas_ecsim import ecsim_gather_pallas

    geom, binned, t, B_p = setup
    rng = np.random.default_rng(11)
    F = jnp.asarray(rng.standard_normal((3, 4, 4, 4)), jnp.float32)
    W = s1_slot_weights(t)
    E_ref = gather_slot_fields(F, W.astype(jnp.float32), geom)
    E_p = ecsim_gather_pallas(t, gather_slots(F, geom), interpret=True)
    np.testing.assert_allclose(np.asarray(E_p), np.asarray(E_ref),
                               rtol=2e-5, atol=2e-6)


def test_islot_matches_slot_weights(setup):
    geom, binned, t, B_p = setup
    W = s1_slot_weights(t)
    I_p, _ = ecsim_particle_terms(B_p, binned.p.astype(jnp.float32),
                                  binned.valid, q=Q, m=M, mpw=MPW, dt=DT)
    Islot_ref = jnp.einsum("gkc,gkcs->gcs", I_p.astype(jnp.float32),
                           W.astype(jnp.float32))
    _, Islot = ecsim_fill_pallas(t, binned.p.astype(jnp.float32), B_p,
                                 binned.valid, q=Q, m=M, mpw=MPW, dt=DT,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(Islot), np.asarray(Islot_ref),
                               rtol=2e-5, atol=2e-6)


def test_pallas_step_route_matches_xla():
    """End-to-end A/B of the two fill/push routes through the full fused
    step: XPIC_FORCE_PALLAS must be a pure performance toggle.  Runs the
    Pallas kernels in interpret mode on CPU (same routing code as on
    TPU).  The jit cache is cleared around the flag flip because the
    routing is resolved at trace time."""
    import numpy as np

    from xpic_tpu.config import Geometry
    from xpic_tpu.ops.binning import bin_state
    from xpic_tpu.parallel import step
    from xpic_tpu.particles import ParticleArrays

    geom = Geometry(dx=0.5, dy=0.5, dz=0.5, dt=1.5, nx=6, ny=6, nz=6, nt=1)
    rng = np.random.default_rng(3)
    n = geom.n_cells * 5
    sp = ParticleArrays(
        r=jnp.asarray(rng.random((n, 3)) * np.array(geom.L), jnp.float32),
        p=jnp.asarray(rng.standard_normal((n, 3)) * 0.02, jnp.float32),
        alive=jnp.ones(n, bool),
    )
    st = bin_state(sp, geom, 16)
    shape = (3,) + geom.shape
    E = jnp.asarray(rng.standard_normal(shape) * 1e-3, jnp.float32)
    B = jnp.asarray(rng.standard_normal(shape) * 1e-3, jnp.float32)
    B0 = jnp.zeros(shape, jnp.float32)
    args = dict(geom=geom, q=-1.0, m=1.0, mpw=0.2, maxit=50)

    old = step._FORCE_PALLAS
    step.ecsim_step_binned.clear_cache()
    try:
        step._FORCE_PALLAS = False
        E1, B1, st1, c1, _ = step.ecsim_step_binned(E, B, B0, st, **args)
        E1, B1, c1, p1 = map(np.asarray, (E1, B1, c1, st1.p))
        step.ecsim_step_binned.clear_cache()
        step._FORCE_PALLAS = True
        E2, B2, st2, c2, _ = step.ecsim_step_binned(E, B, B0, st, **args)
        np.testing.assert_allclose(np.asarray(E2), E1, rtol=0, atol=2e-6)
        np.testing.assert_allclose(np.asarray(B2), B1, rtol=0, atol=2e-6)
        np.testing.assert_allclose(np.asarray(c2), c1, rtol=0, atol=2e-6)
        np.testing.assert_allclose(np.asarray(st2.p), p1, rtol=0, atol=2e-6)
    finally:
        step._FORCE_PALLAS = old
        step.ecsim_step_binned.clear_cache()
