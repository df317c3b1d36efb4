"""Fused segment-field gather for eccapfim (Pallas).

The eccapfim residual's dominant cost is the path-averaged (E, B)
gather over cell-crossing segments: per Picard iteration, per segment,
per component-term, a contraction of three per-axis [G, K, 6] weight
vectors against the per-cell [G, 3, 216] window blocks
(ops/implicit_esirkepov).  As XLA einsums every pairwise contraction
materializes a [G, K, 36] intermediate (~380 MB at the bench shape) to
HBM — the measured r4 bottleneck (0.83M particle-steps/s,
BENCH_NOTES #4) — and the broadcast-chain alternative is worse still
(XLA materializes each of the 216 broadcast columns; measured 38 s per
step, r5).  This kernel keeps the entire per-segment evaluation in
VMEM: per G-block it loads the two window blocks and the (t0, tn)
planes once, computes the spline weights, and runs the factored
216-column contraction for all four segments, all components and both
field gathers with every intermediate in registers.

FLOP floor: ~9.3K FMA per slot per fields() evaluation — about 5 ms on
the v5e VPU at the 32^3 x 50 ppc bench shape, versus the ~160 ms the
einsum route pays in intermediate traffic.

Reference: the same per-segment loop is the reference's hottest
eccapfim code (src/impls/eccapfim/particles.cpp:104-124,
src/algorithms/implicit_esirkepov.cpp:31-76).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .implicit_esirkepov import ANCHOR, MAXSEG, WIDTH
from .splines import spline_1, spline_2


def _sort3(a, b, c):
    """Ascending sort of three arrays (min/max network)."""
    lo1, hi1 = jnp.minimum(a, b), jnp.maximum(a, b)
    lo2, hi2 = jnp.minimum(lo1, c), jnp.maximum(lo1, c)
    mid = jnp.minimum(hi1, hi2)
    return lo2, mid, jnp.maximum(hi1, hi2)


def _crossing_params(t0, tn):
    """Per-axis face-crossing parameter (implicit_esirkepov.split_segments
    without the sort — one axis at a time)."""
    d = tn - t0
    curr = jnp.round(t0)
    last = jnp.round(tn)
    sign = jnp.where(d > 0, 1.0, -1.0)
    bnd = curr + 0.5 * sign
    safe_d = jnp.where(d == 0, 1.0, d)
    tc = jnp.where((curr != last) & (d != 0), (bnd - t0) / safe_d, 2.0)
    tc = jnp.clip(tc, 0.0, 1.0 + 1e-30)
    return jnp.where(tc > 1.0, 1.0, tc)


def _w6(fn, t, shift):
    """[bg, K] -> 6-tuple of weights fn(t - (o + ANCHOR + shift))."""
    return tuple(fn(t - (o + ANCHOR + shift)) for o in range(WIDTH))


def _contract_pair(cols, w_inner, wA6, wB6, wA6b, wB6b, perm):
    """Shared-inner factored contraction of both E terms.

    ``cols(j)`` yields window column j as [bg, 1]; ``w_inner`` is the
    6-tuple shared by both terms (the sh factor, on the component's own
    axis); (wA6, wB6) / (wA6b, wB6b) the per-term outer factors.
    ``perm(oi, oA, oB) -> j`` maps (inner, outerA, outerB) offsets to
    the flat (z*6+y)*6+x window index.  The inner sums are computed
    once for all 36 outer pairs and reused by both terms (~28% fewer
    FMAs than two independent contractions)."""
    e1 = None
    e2 = None
    for oA in range(WIDTH):
        a1 = None
        a2 = None
        for oB in range(WIDTH):
            inner = None
            for oi in range(WIDTH):
                term = w_inner[oi] * cols(perm(oi, oA, oB))
                inner = term if inner is None else inner + term
            t1 = wB6[oB] * inner
            t2 = wB6b[oB] * inner
            a1 = t1 if a1 is None else a1 + t1
            a2 = t2 if a2 is None else a2 + t2
        e1g = wA6[oA] * a1
        e2g = wA6b[oA] * a2
        e1 = e1g if e1 is None else e1 + e1g
        e2 = e2g if e2 is None else e2 + e2g
    return e1 + e2


def _contract_one(cols, wx6, wy6, wz6):
    """Single-term factored contraction (B gather)."""
    e = None
    for oz in range(WIDTH):
        ay = None
        for oy in range(WIDTH):
            ax = None
            for ox in range(WIDTH):
                term = wx6[ox] * cols((oz * WIDTH + oy) * WIDTH + ox)
                ax = term if ax is None else ax + term
            ty = wy6[oy] * ax
            ay = ty if ay is None else ay + ty
        tz = wz6[oz] * ay
        e = tz if e is None else e + tz
    return e


def _fields_kernel(Eb_ref, Bb_ref, T0_ref, TN_ref, Eout_ref, Bout_ref):
    Eb = Eb_ref[:]          # [bg, 3, 216]
    Bb = Bb_ref[:]
    t0 = tuple(T0_ref[:, a, :] for a in range(3))   # [bg, K] per axis
    tn = tuple(TN_ref[:, a, :] for a in range(3))
    d = tuple(tn[a] - t0[a] for a in range(3))

    s1, s2, s3 = _sort3(*(_crossing_params(t0[a], tn[a]) for a in range(3)))
    zeros = jnp.zeros_like(s1)
    ones = jnp.ones_like(s1)

    def tau(si):
        """taus[si] for a traced si (select chain — keeps the segment
        loop a lax.fori_loop, which bounds Mosaic's register liveness;
        the fully unrolled 4-segment body spilled 417 MB of VMEM)."""
        out = jnp.where(si >= 4, ones, zeros)
        out = jnp.where(si == 1, s1, out)
        out = jnp.where(si == 2, s2, out)
        return jnp.where(si == 3, s3, out)

    def seg_body(s, acc):
        Eacc, Bacc = acc
        a, b = tau(s), tau(s + 1)
        bs = b - a
        seg0 = tuple(t0[ax] + a * d[ax] for ax in range(3))
        seg1 = tuple(t0[ax] + b * d[ax] for ax in range(3))
        th = tuple(0.5 * (seg0[ax] + seg1[ax]) for ax in range(3))

        sh = [_w6(spline_1, th[ax], 0.5) for ax in range(3)]
        sn = [_w6(spline_2, seg1[ax], 0.0) for ax in range(3)]
        s0 = [_w6(spline_2, seg0[ax], 0.0) for ax in range(3)]
        bs6 = bs / 6.0

        # E: per component cx with cyclic (cy, cz); weight on axis cx is
        # sh[cx] (shared by both terms -> inner loop), axis cy carries
        # sn/s0, axis cz the (2 sn + s0) / (2 s0 + sn) combinations.
        Eacc = list(Eacc)
        Bacc = list(Bacc)
        for cx in range(3):
            cy, cz = (cx + 1) % 3, (cx + 2) % 3
            A6 = tuple(2.0 * sn[cz][o] + s0[cz][o] for o in range(WIDTH))
            Bc6 = tuple(2.0 * s0[cz][o] + sn[cz][o] for o in range(WIDTH))

            def cols(j, _c=cx):
                return Eb[:, _c, j:j + 1]

            # perm: inner runs over axis cx, outerA over cy, outerB
            # over cz; flat j = (oz*6 + oy)*6 + ox with (x, y, z) =
            # spatial axes 0, 1, 2.
            def perm(oi, oA, oB, _cx=cx, _cy=cy, _cz=cz):
                o = [0, 0, 0]
                o[_cx], o[_cy], o[_cz] = oi, oA, oB
                return (o[2] * WIDTH + o[1]) * WIDTH + o[0]

            e = _contract_pair(cols, sh[cx], sn[cy], A6, s0[cy], Bc6,
                               perm)
            Eacc[cx] = Eacc[cx] + bs6 * e

        # B: plain order-2 magnetic Yee products at the midpoint.
        wn = [_w6(spline_2, th[ax], 0.0) for ax in range(3)]
        ws = [_w6(spline_2, th[ax], 0.5) for ax in range(3)]
        maps = (
            (wn[0], ws[1], ws[2]),
            (ws[0], wn[1], ws[2]),
            (ws[0], ws[1], wn[2]),
        )
        for c in range(3):
            wx6, wy6, wz6 = maps[c]

            def bcols(j, _c=c):
                return Bb[:, _c, j:j + 1]

            e = _contract_one(bcols, wx6, wy6, wz6)
            Bacc[c] = Bacc[c] + bs * e
        return (tuple(Eacc), tuple(Bacc))

    acc0 = (tuple(jnp.zeros_like(t0[0]) for _ in range(3)),
            tuple(jnp.zeros_like(t0[0]) for _ in range(3)))
    Eacc, Bacc = jax.lax.fori_loop(0, MAXSEG, seg_body, acc0)
    for c in range(3):
        Eout_ref[:, c, :] = Eacc[c]
        Bout_ref[:, c, :] = Bacc[c]


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
def segment_fields_pallas(Eblk, Bblk, t0, tn, interpret: bool = False):
    """Path-averaged (E_p, B_p) [G, K, 3] over the 4-segment split of
    the move t0 -> tn (both [G, K, 3] cell-relative), against window
    blocks [G, 3, 6, 6, 6] — one dispatch, everything in VMEM.
    Bit-compatible with eccapfim._segment_fields' XLA form up to sum
    reassociation."""
    import sys

    if sys.getrecursionlimit() < 100000:
        sys.setrecursionlimit(100000)
    G, K, _ = t0.shape
    Eb = Eblk.reshape(G, 3, WIDTH ** 3)
    Bb = Bblk.reshape(G, 3, WIDTH ** 3)
    T0 = jnp.swapaxes(t0, 1, 2)  # [G, 3, K]
    TN = jnp.swapaxes(tn, 1, 2)
    # Small blocks: Mosaic spills essentially every SSA value of the
    # ~2.6K-op segment body to its VMEM stack (measured 120 MB scoped
    # at bg=64 against the 16 MB limit); bg=8 bounds the stack.
    bg = _pick_block(G, 8)
    bspec = pl.BlockSpec((bg, 3, WIDTH ** 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec((bg, 3, K), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    E_p, B_p = pl.pallas_call(
        _fields_kernel,
        grid=(G // bg,),
        in_specs=[bspec, bspec, tspec, tspec],
        out_specs=(tspec, tspec),
        out_shape=(jax.ShapeDtypeStruct((G, 3, K), t0.dtype),
                   jax.ShapeDtypeStruct((G, 3, K), t0.dtype)),
        cost_estimate=pl.CostEstimate(
            flops=G * K * 9500,
            bytes_accessed=2 * G * 3 * WIDTH ** 3 * 4 + 8 * G * 3 * K * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(Eb, Bb, T0, TN)
    return jnp.swapaxes(E_p, 1, 2), jnp.swapaxes(B_p, 1, 2)
