"""Implicit (time-averaged) Esirkepov kernel properties
(reference: src/algorithms/implicit_esirkepov.cpp)."""

import jax.numpy as jnp
import numpy as np

from xpic_tpu.config import Geometry
from xpic_tpu.ops.binning import bin_sorted, choose_slots, max_per_cell
from xpic_tpu.ops.gather_scatter import cell_t, deposit_scalar
from xpic_tpu.ops.implicit_esirkepov import (
    deposit_J_implicit,
    gather_B_implicit,
    gather_E_implicit,
    gather_window_blocks,
    scatter_blocks,
    split_segments,
)
from xpic_tpu.ops.stencil import divergence_negative
from xpic_tpu.particles import ParticleArrays, sort_by_cell

GEOM = Geometry(dx=0.5, dy=0.5, dz=0.5, dt=0.2, nx=6, ny=5, nz=4, nt=1)


def binned_species(n=150, seed=0):
    rng = np.random.default_rng(seed)
    r = rng.random((n, 3)) * np.array(GEOM.L)
    p = rng.standard_normal((n, 3)) * 0.05
    sp = sort_by_cell(
        ParticleArrays(r=jnp.asarray(r), p=jnp.asarray(p),
                       alive=jnp.ones(n, bool)),
        GEOM,
    )
    slots = choose_slots(max_per_cell(sp, GEOM))
    return bin_sorted(sp, GEOM, slots)


def test_constant_field_gather():
    binned = binned_species()
    val = jnp.asarray([2.0, -3.0, 5.0])
    F = jnp.ones((3,) + GEOM.shape) * val[:, None, None, None]
    blocks = gather_window_blocks(F, GEOM)
    t0 = cell_t(GEOM, binned.r)
    rng = np.random.default_rng(1)
    tn = t0 + jnp.asarray(rng.uniform(-0.5, 0.5, t0.shape))
    E_p = gather_E_implicit(blocks, t0, tn)
    np.testing.assert_allclose(
        np.asarray(E_p), np.broadcast_to(np.asarray(val), E_p.shape),
        atol=1e-12,
    )
    B_p = gather_B_implicit(blocks, 0.5 * (t0 + tn))
    np.testing.assert_allclose(
        np.asarray(B_p), np.broadcast_to(np.asarray(val), B_p.shape),
        atol=1e-12,
    )


def test_gather_deposit_adjoint():
    """<gather_E(F), v * s> == <F, deposit(v, s)> — deposit is the exact
    adjoint of the gather."""
    binned = binned_species(seed=2)
    rng = np.random.default_rng(3)
    F = jnp.asarray(rng.standard_normal((3,) + GEOM.shape))
    t0 = cell_t(GEOM, binned.r)
    tn = t0 + jnp.asarray(rng.uniform(-0.5, 0.5, t0.shape))
    v = jnp.asarray(rng.standard_normal(t0.shape))
    s = jnp.asarray(rng.random(binned.valid.shape))

    blocks = gather_window_blocks(F, GEOM)
    E_p = gather_E_implicit(blocks, t0, tn)
    lhs = float(jnp.sum(E_p * v * s[..., None]))

    Jblk = deposit_J_implicit(t0, tn, v, s)
    J = scatter_blocks(Jblk, GEOM)
    rhs = float(jnp.sum(F * J))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-12)


def test_charge_conservation_segments():
    """Summed over cell-crossing segments, the implicit Esirkepov
    deposit satisfies div J = -(rho_n - rho_0)/dt with the order-2 node
    density — the eccapfim charge-conservation property
    (eccapfim/particles.cpp:158-170)."""
    binned = binned_species(seed=5)
    dt = GEOM.dt
    rng = np.random.default_rng(7)
    t0 = cell_t(GEOM, binned.r)
    # sub-cell displacements
    disp = jnp.asarray(rng.uniform(-0.8, 0.8, t0.shape))
    tn = t0 + disp
    d = jnp.asarray(GEOM.cell_steps)
    v = disp * d / dt  # velocity consistent with the move

    q_mpw = -1.0
    a0 = q_mpw / dt  # deposit q*mpw*v*(weights)/... so that div J matches
    taus = split_segments(t0, tn)
    valid_f = binned.valid.astype(t0.dtype)
    Jblk = 0.0
    for s in range(4):
        a = taus[..., s][..., None]
        b = taus[..., s + 1][..., None]
        seg0 = t0 + a * disp
        seg1 = t0 + b * disp
        bs = (b - a)[..., 0] * valid_f
        Jblk = Jblk + deposit_J_implicit(seg0, seg1, v, q_mpw * bs)
    J = scatter_blocks(Jblk, GEOM)

    ones = jnp.ones(binned.valid.shape)
    rho0 = q_mpw * deposit_scalar(ones, t0, binned.valid, GEOM, order=2,
                                  width=6, anchor=-2)
    rhon = q_mpw * deposit_scalar(ones, tn, binned.valid, GEOM, order=2,
                                  width=6, anchor=-2)
    resid = np.asarray(
        (rhon - rho0) / dt
        + divergence_negative(J, GEOM.cell_steps, GEOM.bounds)
    )
    np.testing.assert_allclose(resid, 0.0, atol=1e-11)


def test_split_segments_structure():
    t0 = jnp.asarray([[[0.2, 0.2, 0.2]]])
    tn = jnp.asarray([[[0.8, 0.2, 0.2]]])  # crosses x face at 0.5
    taus = np.asarray(split_segments(t0, tn))[0, 0]
    assert taus[0] == 0.0 and taus[-1] == 1.0
    np.testing.assert_allclose(taus[1], 0.5, atol=1e-12)
    assert np.all(np.diff(taus) >= -1e-15)


def test_segment_fields_pallas_matches_xla():
    """The fused Pallas segment-field gather (ops/pallas_implicit,
    interpret mode off-TPU) must match the einsum path — compared in
    f64 where the einsum is exact (on TPU the f32 einsum itself drops
    to bf16 multiplies, which is one reason the kernel exists)."""
    import jax.numpy as jnp

    from xpic_tpu.ops.pallas_implicit import segment_fields_pallas
    from xpic_tpu.schemes.eccapfim import _segment_fields

    geom = Geometry(dx=0.5, dy=0.4, dz=0.6, dt=1.5, nx=8, ny=6, nz=4,
                    nt=1)
    G, K = geom.n_cells, 16
    rng = np.random.default_rng(3)
    E = jnp.asarray(rng.standard_normal((3,) + geom.shape), jnp.float32)
    B = jnp.asarray(rng.standard_normal((3,) + geom.shape), jnp.float32)
    Eblk = gather_window_blocks(E, geom)
    Bblk = gather_window_blocks(B, geom)
    t0 = jnp.asarray(rng.random((G, K, 3)), jnp.float32)
    tn = jnp.asarray(t0 + (rng.random((G, K, 3)) - 0.5) * 1.6,
                     jnp.float32)

    E64, B64 = _segment_fields(
        jnp.asarray(Eblk, jnp.float64), jnp.asarray(Bblk, jnp.float64),
        jnp.asarray(t0, jnp.float64), jnp.asarray(tn, jnp.float64))
    E_p, B_p = segment_fields_pallas(Eblk, Bblk, t0, tn, interpret=True)
    np.testing.assert_allclose(np.asarray(E_p), np.asarray(E64),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(B_p), np.asarray(B64),
                               rtol=2e-5, atol=2e-5)
