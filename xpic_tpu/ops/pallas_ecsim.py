"""Fused Pallas kernel for the ECSIM fill phase (the hottest loop).

Replaces the XLA pipeline weights -> particle terms -> deposit-sums ->
assemble_blocks (reference hot loop: src/impls/ecsim/particles.cpp:33-173)
with one pass over the cell-binned particles.  The XLA einsum route
materializes the [G, K, 3, 12] slot weights (377 MB at the bench size)
plus a ~1 GB dot intermediate in HBM; here the weights live only in
VMEM, so HBM traffic drops to the inputs (t, v, B_p, mask) plus the
block output L — measured ~4x faster on v5e.

Layout notes (Mosaic tiling wants the particle-slot axis K on lanes):

* particle inputs come in as ``[3, G, K]`` planes (one transpose in XLA,
  fused into the producers);
* per component c the 12 slot weights W_c are built in VMEM as
  ``[BG, 12, K]`` stacks of separable axis-weight products, exactly the
  s1 node/staggered hats of ``ecsim_blocks.s1_slot_weights``;
* the 9 (c, d) blocks of L are batched ``[BG, 12, K] x [BG, K, 12]``
  dot_generals (MXU), written to the ``[G, 3, 12, 3, 12]`` block array
  used by ``ecsim_blocks.apply_blocks``;
* the slot-summed implicit current comes out as ``[G, 3, 12]``, ready
  for the 36 rolled grid adds (``deposit_slot_sums``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu



def _pick_block(G: int, block_g: int) -> int:
    """Largest divisor of G that is <= block_g, preferring multiples of 8
    (sublane-friendly).  Guards against the degenerate bg=1 grid that a
    plain halving loop produces for odd G — one cell per grid program is
    pathological launch overhead."""
    bg = min(block_g, G)
    divisors = [c for c in range(bg, 0, -1) if G % c == 0]
    for cand in divisors:
        if cand % 8 == 0:
            return cand
    return divisors[0]

def _hat_node(t):
    """Order-1 node weights at offsets 0, 1: S1(t), S1(t-1) for t in [0,1)."""
    return 1.0 - t, t


def _hat_stag(t):
    """Order-1 staggered weights at offsets -1, 0, 1 around the
    half-shifted lattice: S1(t+0.5), S1(t-0.5), S1(t-1.5), t in [0,1)."""
    w0 = jnp.maximum(0.0, 0.5 - t)
    w1 = 1.0 - jnp.abs(t - 0.5)
    w2 = jnp.maximum(0.0, t - 0.5)
    return w0, w1, w2


def _rot_entry(c, d, bx, by, bz, one):
    """matB[c][d] (ecsim/particles.cpp:107-115)."""
    rows = (
        (lambda: one + bx * bx, lambda: bz + bx * by, lambda: -by + bx * bz),
        (lambda: -bz + by * bx, lambda: one + by * by, lambda: bx + by * bz),
        (lambda: by + bz * bx, lambda: -bx + bz * by, lambda: one + bz * bz),
    )
    return rows[c][d]()


def _fill_kernel(t_ref, v_ref, b_ref, mask_ref, L_ref, I_ref, *,
                 q, m, mpw, dt):
    tx, ty, tz = t_ref[0], t_ref[1], t_ref[2]          # [BG, K]
    vx, vy, vz = v_ref[0], v_ref[1], v_ref[2]
    mask = mask_ref[:]                                  # [BG, K]

    half = 0.5 * dt * q / m
    bx = b_ref[0] * half
    by = b_ref[1] * half
    bz = b_ref[2] * half
    b2 = bx * bx + by * by + bz * bz
    inv = 1.0 / (1.0 + b2)

    # --- separable axis weights --------------------------------------
    wnx0, wnx1 = _hat_node(tx)
    wny0, wny1 = _hat_node(ty)
    wnz0, wnz1 = _hat_node(tz)
    wsx = _hat_stag(tx)
    wsy = _hat_stag(ty)
    wsz = _hat_stag(tz)
    wn = ((wnx0, wnx1), (wny0, wny1), (wnz0, wnz1))

    # W_c [BG, 12, K]; slot layouts match ecsim_blocks.OFFSETS
    WX = jnp.stack(
        [wnz * wny * ws for wnz in wn[2] for wny in wn[1] for ws in wsx],
        axis=1,
    )
    WY = jnp.stack(
        [wnz * ws * wnx for wnz in wn[2] for ws in wsy for wnx in wn[0]],
        axis=1,
    )
    WZ = jnp.stack(
        [ws * wny * wnx for ws in wsz for wny in wn[1] for wnx in wn[0]],
        axis=1,
    )
    W = (WX, WY, WZ)

    # --- implicit current I_p = q mpw/(1+b^2) (v + v x b + (v.b) b) ---
    coef_I = (q * mpw) * inv * mask
    vdotb = vx * bx + vy * by + vz * bz
    Ic = (
        coef_I * (vx + (vy * bz - vz * by) + vdotb * bx),
        coef_I * (vy + (vz * bx - vx * bz) + vdotb * by),
        coef_I * (vz + (vx * by - vy * bx) + vdotb * bz),
    )
    for c in range(3):
        I_ref[:, c, :] = jnp.sum(W[c] * Ic[c][:, None, :], axis=-1)

    # --- L blocks: 9 batched [12,K]x[K,12] MXU dots -------------------
    A_p = (0.5 * dt * dt * mpw * q * q / m) * inv * mask
    one = jnp.ones_like(bx)
    for c in range(3):
        for d in range(3):
            M_cd = A_p * _rot_entry(c, d, bx, by, bz, one)  # [BG, K]
            lhs = W[c] * M_cd[:, None, :]                   # [BG, 12, K]
            L_ref[:, c, :, d, :] = jax.lax.dot_general(
                lhs, W[d], (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )


def _gather_kernel(t_ref, f_ref, out_ref):
    tx, ty, tz = t_ref[0], t_ref[1], t_ref[2]          # [BG, K]

    wnx0, wnx1 = _hat_node(tx)
    wny0, wny1 = _hat_node(ty)
    wnz0, wnz1 = _hat_node(tz)
    wsx = _hat_stag(tx)
    wsy = _hat_stag(ty)
    wsz = _hat_stag(tz)
    wn = ((wnx0, wnx1), (wny0, wny1), (wnz0, wnz1))

    WX = [wnz * wny * ws for wnz in wn[2] for wny in wn[1] for ws in wsx]
    WY = [wnz * ws * wnx for wnz in wn[2] for ws in wsy for wnx in wn[0]]
    WZ = [ws * wny * wnx for ws in wsz for wny in wn[1] for wnx in wn[0]]

    for c, W in enumerate((WX, WY, WZ)):
        acc = W[0] * f_ref[:, c, 0][:, None]
        for s in range(1, 12):
            acc = acc + W[s] * f_ref[:, c, s][:, None]
        out_ref[c] = acc


@functools.partial(jax.jit, static_argnames=("block_g", "interpret"))
def ecsim_gather_pallas(t, Fg, *, block_g: int = 128,
                        interpret: bool = False):
    """Interpolate an E-staggered field at the particles through the s1
    slot weights: (t [G,K,3], Fg [G,3,12] slot values) -> E_p [G,K,3].

    The Pallas twin of ``ecsim_blocks.gather_slot_fields`` — the weights
    are rebuilt in VMEM instead of being materialized in HBM
    (interpolate_E_s1, ecsim/simulation.cpp:8-64).
    """
    G, K, _ = t.shape
    bg = _pick_block(G, block_g)
    grid = (G // bg,)

    t3 = jnp.transpose(t, (2, 0, 1)).astype(jnp.float32)
    out = pl.pallas_call(
        _gather_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, bg, K), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bg, 3, 12), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, bg, K), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, G, K), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=G * K * 3 * 24,
            bytes_accessed=3 * G * K * 4 * 2 + G * 36 * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(t3, Fg.astype(jnp.float32))
    return jnp.transpose(out, (1, 2, 0))


@functools.partial(jax.jit, static_argnames=("q", "m", "mpw", "dt",
                                             "block_g", "interpret"))
def ecsim_fill_pallas(t, v, B_p, valid, *, q: float, m: float, mpw: float,
                      dt: float, block_g: int = 64,
                      interpret: bool = False):
    """Fused fill: (t, v, B_p, valid) -> (L [G,3,12,3,12], Islot [G,3,12]).

    ``t`` is the cell-relative position [G, K, 3] (in [0,1)); ``v`` the
    per-slot velocity; ``B_p`` the s1-gathered magnetic field at the
    particles; ``valid`` the slot mask.  f32 only (the f64 parity path
    keeps the XLA einsum route).
    """
    G, K, _ = t.shape
    bg = _pick_block(G, block_g)
    grid = (G // bg,)

    t3 = jnp.transpose(t, (2, 0, 1)).astype(jnp.float32)
    v3 = jnp.transpose(v, (2, 0, 1)).astype(jnp.float32)
    b3 = jnp.transpose(B_p, (2, 0, 1)).astype(jnp.float32)
    mask = valid.astype(jnp.float32)

    plane = pl.BlockSpec((3, bg, K), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
    kernel = functools.partial(_fill_kernel, q=q, m=m, mpw=mpw, dt=dt)
    L, Islot = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[plane, plane, plane,
                  pl.BlockSpec((bg, K), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((bg, 3, 12, 3, 12), lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bg, 3, 12), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((G, 3, 12, 3, 12), jnp.float32),
            jax.ShapeDtypeStruct((G, 3, 12), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * G * K * 9 * 12 * 12 + 40 * G * K,
            bytes_accessed=(3 * 3 + 1) * G * K * 4 + G * 1296 * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(t3, v3, b3, mask)
    return L, Islot
