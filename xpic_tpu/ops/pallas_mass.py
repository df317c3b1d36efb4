"""Fused matrix-free mass-matrix apply (Pallas).

One kernel evaluates y[g] = sum_k W_k^T M_k W_k x per cell block — the
whole factored-hat gather / rotate / deposit chain of
ops/mass_free.mass_apply in VMEM.  As XLA ops the chain materializes
several [G, K] intermediates to HBM between fusions (measured 1.36 ms
per apply at the 32^3 x 50ppc bench shape vs the ~0.25 ms the (t, b,
coef) traffic alone costs at streaming bandwidth); here each [bg, 8, K]
operand block is read once and everything else lives in registers/VMEM.

Operand layout: the per-step packed mass operands [G, 8, K] with
channel rows (tx, ty, tz, bx, by, bz, coef, 0) — K on lanes, so every
hat/rotate op is a full-width VPU op (the [G, K, 3] form puts the
3-component axis on lanes).  Packing happens ONCE per step in
``mass_free.mass_operands``; the solver re-reads it per iteration
(VERDICT r4 ask #1a).

Reference: the same per-particle loop is the hottest in the reference
(src/impls/ecsim/particles.cpp:33-173); the factored form is documented
in ops/mass_free.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _hats(ta):
    """Per-axis s1 factors of one t plane [bg, K] (mass_free._axis_hats)."""
    wn = (1.0 - ta, ta)
    ws = (
        jnp.maximum(0.0, 0.5 - ta),
        1.0 - jnp.abs(ta - 0.5),
        jnp.maximum(0.0, ta - 0.5),
    )
    return wn, ws


def _mass_kernel(xg_ref, op_ref, y_ref):
    P = op_ref[:]                       # [bg, 8, K]
    xg = xg_ref[:]                      # [bg, 3, 12]
    hats = [_hats(P[:, a]) for a in range(3)]
    wn = [h[0] for h in hats]
    ws = [h[1] for h in hats]
    # Component (outer, mid, inner) factor sets in slot order — matches
    # mass_free._component_factors / ecsim_blocks.OFFSETS.
    comps = (
        (wn[2], wn[1], ws[0]),  # X
        (wn[2], ws[1], wn[0]),  # Y
        (ws[2], wn[1], wn[0]),  # Z
    )

    # gather: u_c[bg, K] = sum_s W_c[.., s] * xg[:, c, s]
    u = []
    for c in range(3):
        fo, fm, fi = comps[c]
        no, nm, ni = len(fo), len(fm), len(fi)
        xc = xg[:, c, :]                # [bg, 12]
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
        u.append(e)

    # rotate: y_c = coef * (u + (b.u) b + u x b)
    bx, by, bz = P[:, 3], P[:, 4], P[:, 5]
    coef = P[:, 6]
    ux, uy, uz = u
    ub = ux * bx + uy * by + uz * bz
    y = (
        coef * (ux + ub * bx + (uy * bz - uz * by)),
        coef * (uy + ub * by + (uz * bx - ux * bz)),
        coef * (uz + ub * bz + (ux * by - uy * bx)),
    )

    # deposit: Y[bg, c, s] = sum_k W_c[.., s] * y_c
    for c in range(3):
        fo, fm, fi = comps[c]
        no, nm, ni = len(fo), len(fm), len(fi)
        cols = []
        for o in range(no):
            v1 = fo[o] * y[c]
            for mth in range(nm):
                v2 = fm[mth] * v1
                for i in range(ni):
                    cols.append(jnp.sum(fi[i] * v2, axis=1, keepdims=True))
        y_ref[:, c, :] = jnp.concatenate(cols, axis=1)


def _pick_block(G: int, want: int) -> int:
    bg = min(want, G)
    for cand in range(bg, 0, -1):
        if G % cand == 0 and cand % 8 == 0:
            return cand
    for cand in range(bg, 0, -1):
        if G % cand == 0:
            return cand
    return 1


@functools.partial(jax.jit, static_argnames=("interpret",))
def mass_apply_slots_pallas(xg, packed, interpret: bool = False):
    """Y[G, 3, 12] = per-cell W^T M W xg for one species' packed
    operands [G, 8, K] (see module doc).  The caller wraps with
    ``gather_slots`` / ``deposit_slot_sums``."""
    G, _, K = packed.shape
    # Small blocks: the factored chain keeps ~dozens of [bg, K]
    # temporaries live, and Mosaic stack-allocates them in VMEM —
    # bg=512 measured 32 MB scoped (OOM at the 16 MB limit); 128 fits
    # with headroom.
    bg = _pick_block(G, 128)
    xspec = pl.BlockSpec((bg, 3, 12), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((bg, 8, K), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _mass_kernel,
        grid=(G // bg,),
        in_specs=[xspec, ospec],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((G, 3, 12), packed.dtype),
        cost_estimate=pl.CostEstimate(
            flops=G * K * 140,
            bytes_accessed=G * 8 * K * 4 + 2 * G * 36 * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xg, packed)
