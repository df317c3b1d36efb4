"""ECSIM mass-matrix ("Lapenta matrix") as dense per-cell blocks.

The reference assembles a distributed sparse matrix with 1296 COO
entries per active cell — per particle, a (3x12) x (3x12) outer-product
block scaled by the 3x3 magnetic rotation tensor
(src/impls/ecsim/particles.cpp:62-173; index layout
src/impls/ecsim/simulation.cpp:370-469).  Keys to the TPU design:

* Every particle's 12 slots per component sit at *fixed offsets from
  its cell*, so the whole matrix is a block array ``L[G, 3, 12, 3, 12]``
  with one static offset table per component — no indices are stored at
  all (the reference logs gigabytes for them, ecsim/simulation.cpp:349-356).
* Assembly is one einsum over the cell-binned particles —
  ``L = sum_k W[k,c,i] * (A_p matB)[k,c,d] * W[k,d,j]`` — which XLA maps
  onto the MXU.
* The SpMV ``y = matL x`` becomes: gather 36 rolled copies of the grid,
  one batched (36x36) matmul per cell, scatter 36 rolled adds.  The
  dense-block layout turns the reference's irregular SpMV into
  streaming + matmul, the two things TPUs are best at.

Slot layouts (matching ecsim/particles.cpp:147-156):
  component X: slot (k*2 + j)*3 + sx -> offset (z+k, y+j, x+sx-1), E_x staggered in x
  component Y: slot (k*3 + sy)*2 + i -> offset (z+k, y+sy-1, x+i)
  component Z: slot (sz*2 + j)*2 + i -> offset (z+sz-1, y+j, x+i)
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import Geometry
from .gather_scatter import _unroll_back, axis_weights, rolled_flat

# Static slot -> (dz, dy, dx) offset tables per component.
OFFSETS = (
    tuple((k, j, sx - 1) for k in (0, 1) for j in (0, 1) for sx in (0, 1, 2)),
    tuple((k, sy - 1, i) for k in (0, 1) for sy in (0, 1, 2) for i in (0, 1)),
    tuple((sz - 1, j, i) for sz in (0, 1, 2) for j in (0, 1) for i in (0, 1)),
)


def s1_slot_weights(t: jnp.ndarray) -> jnp.ndarray:
    """Per-slot linear Yee weights W[G, K, 3, 12].

    ``t`` is the cell-relative position [G, K, 3] (in [0, 1)).  Node
    weights are the 2-point hat values, staggered weights the 3-point
    hat values around the half-shifted lattice — identical numerics to
    the reference's wn/ws arrays (ecsim/particles.cpp:84-105).
    """
    wn = [axis_weights(t[..., a], 1, 2, 0, False) for a in range(3)]  # [.., 2]
    ws = [axis_weights(t[..., a], 1, 3, -1, True) for a in range(3)]  # [.., 3]
    wnx, wny, wnz = wn
    wsx, wsy, wsz = ws

    lead = t.shape[:-1]
    WX = (
        wnz[..., :, None, None] * wny[..., None, :, None] * wsx[..., None, None, :]
    ).reshape(lead + (12,))
    WY = (
        wnz[..., :, None, None] * wsy[..., None, :, None] * wnx[..., None, None, :]
    ).reshape(lead + (12,))
    WZ = (
        wsz[..., :, None, None] * wny[..., None, :, None] * wnx[..., None, None, :]
    ).reshape(lead + (12,))
    return jnp.stack([WX, WY, WZ], axis=-2)  # [G, K, 3, 12]


def rotation_tensor(b: jnp.ndarray) -> jnp.ndarray:
    """The 3x3 tensor matB (ecsim/particles.cpp:107-115):
    (I + b b^T + [b]_x-like antisymmetric part) for b = (dt/2)(q/m) B_p."""
    bx, by, bz = b[..., 0], b[..., 1], b[..., 2]
    one = jnp.ones_like(bx)
    row0 = jnp.stack([one + bx * bx, +bz + bx * by, -by + bx * bz], axis=-1)
    row1 = jnp.stack([-bz + by * bx, one + by * by, +bx + by * bz], axis=-1)
    row2 = jnp.stack([+by + bz * bx, -bx + bz * by, one + bz * bz], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)  # [..., 3(row), 3(col)]


def ecsim_particle_terms(B_p, v, valid, *, q, m, mpw, dt):
    """Per-slot implicit current I_p and weighted rotation tensor M.

    I_p = q mpw / (1 + b^2) (v + v x b + (v.b) b),
    M = A_p matB with A_p = dt^2/2 mpw q^2 / m / (1 + b^2)
    (ecsim/particles.cpp:107-121).
    """
    b = B_p * (0.5 * dt * q / m)
    b2 = jnp.sum(b * b, axis=-1, keepdims=True)
    I_p = (q * mpw / (1.0 + b2)) * (
        v + jnp.cross(v, b) + jnp.sum(v * b, axis=-1, keepdims=True) * b
    )
    A_p = (0.5 * dt * dt * mpw * q * q / m) / (1.0 + b2)
    M = A_p[..., None] * rotation_tensor(b)
    mask = valid[..., None]
    return jnp.where(mask, I_p, 0.0), jnp.where(mask[..., None], M, 0.0)


def assemble_blocks(W, M):
    """L[G, 3, 12, 3, 12] = sum_k W[g,k,c,i] M[g,k,c,d] W[g,k,d,j].

    The per-cell reduction over the slot axis k is a batched matmul —
    the MXU path replacing the reference's per-particle COO accumulate
    (ecsim/particles.cpp:157-166).  Split into one [12,K]x[K,36] matmul
    per row-component c (instead of one 3-operand einsum): ~12% faster
    on v5e, where the assemble is HBM-bound on the materialized W and
    the wider K-contraction amortizes it better (benchmarks/
    profile_assemble.py: 13.8 ms vs 15.7 ms at the bench shape).
    """
    G, K = W.shape[:2]
    outs = []
    for c in range(3):
        T = (M[:, :, c, :, None] * W).reshape(G, K, 36)  # [G,K,(d,j)]
        outs.append(
            jnp.einsum("gki,gkm->gim", W[:, :, c], T,
                       precision="high",
                       preferred_element_type=W.dtype).reshape(G, 12, 3, 12)
        )
    return jnp.stack(outs, axis=1)


def deposit_slots(values, W, geom: Geometry):
    """Deposit per-particle per-component values through the 12-slot
    weights; returns [3, nz, ny, nx].

    Used for the implicit current currI (ecsim/particles.cpp:127-133).
    ``values`` is [G, K, 3].
    """
    comps = []
    for c in range(3):
        acc = None
        for s in range(12):
            dense = jnp.sum(values[..., c] * W[..., c, s], axis=1).reshape(geom.shape)
            contrib = _unroll_back(dense, OFFSETS[c][s], geom.bounds)
            acc = contrib if acc is None else acc + contrib
        comps.append(acc)
    return jnp.stack(comps)


def deposit_slot_sums(Islot, geom: Geometry):
    """Scatter already slot-summed values [G, 3, 12] onto the grid.

    The rolled-add tail of :func:`deposit_slots` for producers (e.g. the
    Pallas fill kernel) that reduce over the slot axis on-chip.
    """
    comps = []
    for c in range(3):
        acc = None
        for s in range(12):
            contrib = _unroll_back(
                Islot[:, c, s].reshape(geom.shape), OFFSETS[c][s], geom.bounds
            )
            acc = contrib if acc is None else acc + contrib
        comps.append(acc)
    return jnp.stack(comps)


def gather_slots(F, geom: Geometry):
    """Gather the 12 slot values per component per cell: [G, 3, 12]."""
    cols = []
    for c in range(3):
        cols.append(
            jnp.stack(
                [rolled_flat(F[c], OFFSETS[c][s], geom.bounds) for s in range(12)],
                axis=-1,
            )
        )
    return jnp.stack(cols, axis=-2)  # [G, 3, 12]


def apply_blocks(L, x, geom: Geometry):
    """y = matL @ x as gather -> batched block matmul -> scatter."""
    xg = gather_slots(x, geom)  # [G, 3, 12]
    yg = jnp.einsum("gcidj,gdj->gci", L, xg, precision="high",
                    preferred_element_type=x.dtype)
    comps = []
    for c in range(3):
        acc = None
        for s in range(12):
            contrib = _unroll_back(
                yg[:, c, s].reshape(geom.shape), OFFSETS[c][s], geom.bounds
            )
            acc = contrib if acc is None else acc + contrib
        comps.append(acc)
    return jnp.stack(comps)


def gather_slot_fields(F, W, geom: Geometry):
    """Interpolate an E-staggered Yee field at the particles through the
    slot weights: out[g, k, c] = sum_s W[g,k,c,s] * F_c(cell + offset(c, s)).

    Equivalent to interpolate_E_s1 (ecsim/simulation.cpp:8-64); magnetic
    fields have the complementary staggering — use
    ``gather_vector(..., order=1, width=3, anchor=-1, stagger=B_STAGGER)``.
    """
    Fg = gather_slots(F, geom)  # [G, 3, 12]
    # precision="high" (bf16x3, ~1e-6 relative): the r5 "highest" pin
    # on this [G, K, 3, 12] einsum repriced the whole ecsimcorr step
    # 279 -> 415 ms; "high" recovers it to 331 ms while staying well
    # under the f32 path's 1e-5 solve floor.  f64 parity is unaffected
    # by the flag.
    return jnp.einsum("gkcs,gcs->gkc", W, Fg, precision="high",
                      preferred_element_type=W.dtype)
