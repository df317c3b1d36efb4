"""Matrix-free ECSIM mass-matrix application.

The reference assembles matL — 1296 COO entries per active cell, one
(3x12)x(3x12) outer-product block per particle — because on CPUs an
assembled SpMV amortizes over the KSP iterations
(src/impls/ecsim/particles.cpp:62-173, ecsim/simulation.cpp:370-469).
On a TPU the economics invert:

* the assemble is a batched [12, K] x [K, 36] contraction per cell that
  the MXU runs at ~0.4 TF/s (tiny-matmul penalty, measured in
  benchmarks/profile_roofcal.py), ~14 ms at the 32^3 x 50 ppc bench
  shape, plus a 170 MB block write and a 170 MB read per solver
  iteration;
* re-walking the cell-binned particles per iteration is pure VPU
  streaming with the slot axis K on lanes: the s1 weights are separable
  (products of per-axis hats), so one application of
  y = sum_p W_p^T M_p W_p x costs ~130 FLOP/slot in factored form and
  reads only (t, b, coef) — 7 [G, K] planes.

At the production iteration counts (4-7 preconditioned GMRES iterations
per step) matrix-free is strictly cheaper than one assemble, so the
f32 speed path never materializes L at all.  The assembled route
(ecsim_blocks.assemble_blocks / apply_blocks) remains the f64 parity
path and the MatDump diagnostic's source.

The per-slot operator is M_p v = coef * (v + (b.v) b + v x b) with
b = (dt q / 2m) B_p and coef = (dt^2/2) (q^2/m) mpw / (1 + b^2) — the
same rotation tensor as ecsim_blocks.rotation_tensor
(ecsim/particles.cpp:107-121), in closed form.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import Geometry
from .ecsim_blocks import deposit_slot_sums, gather_slots


class MassOp(NamedTuple):
    """Per-species operands of the matrix-free mass apply, packed ONCE
    per step into a single [G, 8, K] array with channel rows
    (tx, ty, tz, bx, by, bz, coef, 0) — K on lanes so every hat/rotate
    op in the per-iteration apply is a full-width VPU op, and the
    solver re-reads one contiguous stream instead of three [G, K, 3]
    arrays (VERDICT r4 ask #1a).  coef = (dt^2/2)(q^2/m) mpw / (1+b^2),
    masked by ``valid``; b = (dt q / 2m) B_p."""

    packed: jnp.ndarray  # [G, 8, K]


def mass_operands(t, B_p, valid, *, q: float, m: float, mpw: float,
                  dt: float) -> MassOp:
    b = B_p * (0.5 * dt * q / m)
    b2 = jnp.sum(b * b, axis=-1)
    coef = jnp.where(valid, (0.5 * dt * dt * mpw * q * q / m) / (1.0 + b2),
                     0.0)
    packed = jnp.stack(
        [t[..., 0], t[..., 1], t[..., 2],
         b[..., 0], b[..., 1], b[..., 2],
         coef, jnp.zeros_like(coef)],
        axis=1,
    )
    return MassOp(packed=packed)


def _axis_hats(t):
    """Separable per-axis s1 factors: node pair (S1(t), S1(t-1)) and the
    staggered triple around the half-shifted lattice — identical
    numerics to ecsim_blocks.s1_slot_weights (ecsim/particles.cpp:84-105),
    never combined into the [G, K, 3, 12] product array."""
    return _axis_hats_planes(tuple(t[..., a] for a in range(3)))


def _axis_hats_planes(t_planes):
    """:func:`_axis_hats` over three separate [G, K] t planes (the
    packed-operand layout)."""
    wn, ws = [], []
    for ta in t_planes:
        wn.append((1.0 - ta, ta))
        ws.append((
            jnp.maximum(0.0, 0.5 - ta),
            1.0 - jnp.abs(ta - 0.5),
            jnp.maximum(0.0, ta - 0.5),
        ))
    return wn, ws


# Per component c: the (outer, mid, inner) axis factor sets in slot
# order — slot index s = (o * len(mid) + m) * len(inner) + i, matching
# ecsim_blocks.OFFSETS (X: wn_z x wn_y x ws_x, etc.).
def _component_factors(wn, ws):
    return (
        (wn[2], wn[1], ws[0]),  # X
        (wn[2], ws[1], wn[0]),  # Y
        (ws[2], wn[1], wn[0]),  # Z
    )


def _gather_component(xc, fo, fm, fi):
    """e[g, k] = sum_s W_c[g, k, s] * xc[g, s] in factored form
    (18 FMA/slot instead of 12 products + 12 FMA)."""
    no, nm, ni = len(fo), len(fm), len(fi)
    e = None
    for o in range(no):
        t2 = None
        for mth in range(nm):
            t1 = None
            for i in range(ni):
                s = (o * nm + mth) * ni + i
                term = fi[i] * xc[:, s][:, None]
                t1 = term if t1 is None else t1 + term
            t1 = fm[mth] * t1
            t2 = t1 if t2 is None else t2 + t1
        t2 = fo[o] * t2
        e = t2 if e is None else e + t2
    return e


def _deposit_component(yc, fo, fm, fi):
    """Y[g, s] = sum_k W_c[g, k, s] * yc[g, k] in factored form;
    returns [G, n_slots] (12)."""
    no, nm, ni = len(fo), len(fm), len(fi)
    cols = []
    for o in range(no):
        u = fo[o] * yc
        for mth in range(nm):
            v = fm[mth] * u
            for i in range(ni):
                cols.append(jnp.sum(fi[i] * v, axis=1))
    # cols are in (o, m, i) order == slot order
    return jnp.stack(cols, axis=-1)


def _rotate(u, b_planes, coef):
    """M v per slot: coef * (u + (b.u) b + u x b) — closed form of
    A_p * rotation_tensor(b) (ecsim/particles.cpp:107-121)."""
    ux, uy, uz = u
    bx, by, bz = b_planes
    ub = ux * bx + uy * by + uz * bz
    return (
        coef * (ux + ub * bx + (uy * bz - uz * by)),
        coef * (uy + ub * by + (uz * bx - ux * bz)),
        coef * (uz + ub * bz + (ux * by - uy * bx)),
    )


def _mass_pallas_ok(dtype) -> bool:
    """Opt-in routing of the apply through the fused Pallas kernel
    (ops/pallas_mass).  MEASURED NEGATIVE at the bench shape (r5): the
    per-cell-block work is tiny ([128, 80] blocks; ~110 short vector
    ops each) and the 256-step grid serializes to ~15 ms/apply vs the
    XLA chain's 1.36 ms — while larger blocks blow the 16 MB VMEM
    scoped-stack limit (~125 live [bg, K] temporaries).  Kept for
    shapes with much larger K and as the record of the experiment;
    ``XPIC_MASS_PALLAS=1`` opts in (f32, 32-bit trace mode, one
    visible device — pl.pallas_call has no SPMD partitioning rule)."""
    import os

    if os.environ.get("XPIC_MASS_PALLAS", "0") != "1":
        return False
    if dtype != jnp.float32 or jax.config.jax_enable_x64:
        return False
    try:
        return len(jax.devices()) == 1
    except Exception:  # pragma: no cover - no backend
        return False


def mass_apply(x, masses, geom: Geometry):
    """y = (sum_species matL_s) @ x without materializing any L:
    gather x at the slots, rotate per slot, deposit back.

    ``masses`` is a sequence of :class:`MassOp`.  Exactly the bilinear
    form of apply_blocks(assemble_blocks(W, M), x) — same sums, no
    [G, 3, 12, 3, 12] block array (unit-tested for equality in
    tests/test_mass_free.py).
    """
    xg = gather_slots(x, geom)  # [G, 3, 12]
    Y = None
    use_pallas = _mass_pallas_ok(x.dtype)
    for op in masses:
        P = op.packed
        if use_pallas:
            from .binning import _pallas_interpret
            from .pallas_mass import mass_apply_slots_pallas

            Ys = mass_apply_slots_pallas(xg, P,
                                         interpret=_pallas_interpret())
        else:
            wn, ws = _axis_hats_planes((P[:, 0], P[:, 1], P[:, 2]))
            comps = _component_factors(wn, ws)
            u = tuple(
                _gather_component(xg[:, c], *comps[c]) for c in range(3)
            )
            y = _rotate(u, (P[:, 3], P[:, 4], P[:, 5]), P[:, 6])
            Ys = jnp.stack(
                [_deposit_component(y[c], *comps[c]) for c in range(3)],
                axis=1,
            )  # [G, 3, 12]
        Y = Ys if Y is None else Y + Ys
    return deposit_slot_sums(Y, geom)


def deposit_vector_slots(vals, t, geom: Geometry):
    """Deposit a per-slot vector (e.g. the implicit current I_p
    [G, K, 3]) through the factored s1 weights; returns [3, nz, ny, nx].
    The W-free twin of ecsim_blocks.deposit_slots."""
    wn, ws = _axis_hats(t)
    comps = _component_factors(wn, ws)
    Y = jnp.stack(
        [_deposit_component(vals[..., c], *comps[c]) for c in range(3)],
        axis=1,
    )
    return deposit_slot_sums(Y, geom)


def gather_vector_slots(F, t, geom: Geometry):
    """Interpolate an E-staggered field at the slots through the
    factored s1 weights; returns [G, K, 3].  The W-free twin of
    ecsim_blocks.gather_slot_fields (interpolate_E_s1,
    ecsim/simulation.cpp:8-64)."""
    Fg = gather_slots(F, geom)  # [G, 3, 12]
    wn, ws = _axis_hats(t)
    comps = _component_factors(wn, ws)
    return jnp.stack(
        [_gather_component(Fg[:, c], *comps[c]) for c in range(3)],
        axis=-1,
    )


def implicit_current(B_p, v, valid, *, q: float, m: float, mpw: float,
                     dt: float):
    """Per-slot implicit current I_p = q mpw/(1+b^2) (v + v x b + (v.b) b)
    (ecsim/particles.cpp:107-121) — the I_p half of
    ecsim_blocks.ecsim_particle_terms without building the [G, K, 3, 3]
    rotation array the matrix-free path never needs."""
    b = B_p * (0.5 * dt * q / m)
    b2 = jnp.sum(b * b, axis=-1, keepdims=True)
    I_p = (q * mpw / (1.0 + b2)) * (
        v + jnp.cross(v, b) + jnp.sum(v * b, axis=-1, keepdims=True) * b
    )
    return jnp.where(valid[..., None], I_p, 0.0)


def mass_trace(op: MassOp) -> jnp.ndarray:
    """tr(matL) for one species without assembling: per slot,
    sum_c M_cc * sum_i W_c[i]^2, where sum_i W_c[i]^2 factorizes into
    the per-axis sums of squared hats.  Feeds the Chebyshev
    preconditioner's diagonal shift (solvers/spectral.py)."""
    P = op.packed
    wn, ws = _axis_hats_planes((P[:, 0], P[:, 1], P[:, 2]))
    comps = _component_factors(wn, ws)
    bx, by, bz = P[:, 3], P[:, 4], P[:, 5]
    rot_cc = (1.0 + bx * bx, 1.0 + by * by, 1.0 + bz * bz)
    total = None
    for c in range(3):
        fo, fm, fi = comps[c]
        w2 = (
            sum(f * f for f in fo)
            * sum(f * f for f in fm)
            * sum(f * f for f in fi)
        )
        term = P[:, 6] * rot_cc[c] * w2
        total = term if total is None else total + term
    return jnp.sum(total)
