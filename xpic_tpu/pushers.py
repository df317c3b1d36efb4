"""Particle integrators: Boris family, Crank-Nicolson, drift-kinetic.

All pushers are pure, batched functions over ``[N, 3]`` arrays, designed
for ``vmap``/jit instead of the reference's per-particle scalar calls:

* Boris magnetic rotation variants M/B/C1/C2 and the electromagnetic
  ``vEB`` update (reference: src/algorithms/boris_push.cpp:19-91, after
  the classification of https://doi.org/10.1016/j.jcp.2022.111422);
* implicit Crank-Nicolson Picard iteration with a fields callback,
  realized as a masked fixed-trip-count ``lax.while_loop``
  (reference: src/algorithms/crank_nicolson_push.cpp:31-71);
* implicit drift-kinetic (guiding-center) integrator
  (reference: src/algorithms/drift_kinetic_push.cpp:48-160).

The non-relativistic convention of the reference is kept: ``p`` is
velocity in units of c and q/m alone defines the motion
(src/algorithms/boris_push.h:14-16).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


def _norm(v, axis=-1, keepdims=True):
    return jnp.sqrt(jnp.sum(v * v, axis=axis, keepdims=keepdims))


def _normalized(v, eps=1e-300):
    n = _norm(v)
    return v / jnp.maximum(n, eps)


def update_r(dt, r, p):
    """r += p * dt (reference: BorisPush::update_r, boris_push.cpp:20-23)."""
    return r + p * dt


def _rotate(v, B, sin_t, cos_t):
    """v -> v_par + cos*v_perp + sin*(b x v_perp) around unit b = B/|B|.

    Reference: BorisPush::update_v_impl (boris_push.cpp:85-91).
    """
    b = _normalized(B)
    v_par = jnp.sum(v * b, axis=-1, keepdims=True) * b
    v_t = v - v_par
    return v_par + cos_t * v_t + sin_t * jnp.cross(b, v_t)


def _theta(dt, qm, B):
    """theta = -qm * |B| * dt (reference: boris_push.cpp:60-63)."""
    return -qm * _norm(B) * dt


def update_vM(dt, qm, p, B):
    """Exact-rotation variant (theta = -qm |B| dt).

    The (sin, cos) pair is renormalized so the rotation matrix stays
    exactly orthogonal even where the backend computes f64
    transcendentals at reduced precision (observed on the XLA paths
    used here: sin^2+cos^2-1 ~ 4e-8); without this the particle energy
    would drift at that rate per step instead of being conserved to
    roundoff as in the reference (tests/boris_push/boris_push_ex1.cpp:63-70).
    """
    t = _theta(dt, qm, B)
    s, c = jnp.sin(t), jnp.cos(t)
    # exact sqrt/divide (lax.rsqrt is an approximate TPU instruction and
    # would leak ~5e-15 of energy per step)
    renorm = 1.0 / jnp.sqrt(s * s + c * c)
    return _rotate(p, B, s * renorm, c * renorm)


def update_vB(dt, qm, p, B):
    """Classic Boris half-angle tangent variant (boris_push.cpp:65-70)."""
    t = _theta(dt, qm, B)
    d = 1.0 + 0.25 * t * t
    return _rotate(p, B, t / d, (1.0 - 0.25 * t * t) / d)


def update_vC1(dt, qm, p, B):
    """Chin C1 variant (boris_push.cpp:72-76)."""
    t = _theta(dt, qm, B)
    return _rotate(p, B, t * jnp.sqrt(1.0 - 0.25 * t * t), 1.0 - 0.5 * t * t)


def update_vC2(dt, qm, p, B):
    """Chin C2 variant (boris_push.cpp:78-82)."""
    t = _theta(dt, qm, B)
    return _rotate(p, B, t, jnp.sqrt(1.0 - t * t))


def update_vEB(dt, qm, p, E, B):
    """Electromagnetic Boris update (reference: boris_push.cpp:48-57).

    w = v + a/2;  v += a + (b x w + 0.5 b x (b x w)) / (1 + b^2/4)
    with a = dt*qm*E, b = -dt*qm*B.
    """
    alpha = dt * qm
    a = alpha * E
    b = -alpha * B
    w = p + 0.5 * a
    b2 = jnp.sum(b * b, axis=-1, keepdims=True)
    bxw = jnp.cross(b, w)
    return p + a + (bxw + 0.5 * jnp.cross(b, bxw)) / (1.0 + 0.25 * b2)


BORIS_VARIANTS = {
    "M": update_vM,
    "B": update_vB,
    "C1": update_vC1,
    "C2": update_vC2,
}


class CNResult(NamedTuple):
    r: jax.Array
    p: jax.Array
    iterations: jax.Array  # [N] int32
    residual: jax.Array  # [N] final residual norm
    converged: jax.Array  # [N] bool


def crank_nicolson_push(
    dt: float,
    qm: float,
    r0: jax.Array,
    p0: jax.Array,
    fields_fn: Callable[[jax.Array, jax.Array], tuple[jax.Array, jax.Array]],
    atol: float = 1e-7,
    rtol: float = 1e-7,
    maxit: int = 30,
) -> CNResult:
    """Batched implicit Crank-Nicolson particle move.

    ``fields_fn(rn, r0) -> (E_p, B_p)`` evaluates fields along the path
    (the reference's SetFields callback, crank_nicolson_push.h:23-26).
    The Picard loop (crank_nicolson_push.cpp:51-67) solves

        v_h = (w + w x b + b (w . b)) / (1 + b^2),  w = p0 + a,
        a = (dt/2) qm E_p,  b = (dt/2) qm B_p,
        rn = r0 + dt v_h,  pn = 2 v_h - p0,

    iterating until |(pn - p0) - dt qm (E_p + v_h x B_p)| < atol + rtol*r0.
    All particles run the same fixed-bound loop with a convergence mask
    (data-dependent exits do not jit); divergence is *reported*, not
    aborted — check ``converged`` (reference aborts,
    crank_nicolson_push.cpp:69-70).
    """
    vh0 = p0  # pn initialized to p0 => vh = p0
    rn0 = r0 + dt * vh0
    E0, B0 = fields_fn(rn0, r0)

    def residue(pn, vh, E, B):
        return jnp.linalg.norm(
            (pn - p0) - dt * qm * (E + jnp.cross(vh, B)), axis=-1
        )

    res0 = residue(p0, vh0, E0, B0)
    target = atol + rtol * res0
    alpha = 0.5 * dt * qm

    def body(state):
        it, rn, pn, E, B, res, active = state
        a = alpha * E
        b = alpha * B
        w = p0 + a
        b2 = jnp.sum(b * b, axis=-1, keepdims=True)
        vh = (w + jnp.cross(w, b) + b * jnp.sum(w * b, axis=-1, keepdims=True)) / (
            1.0 + b2
        )
        rn_new = r0 + dt * vh
        pn_new = 2.0 * vh - p0
        # Only still-active lanes move.
        m = active[:, None]
        rn = jnp.where(m, rn_new, rn)
        pn = jnp.where(m, pn_new, pn)
        res_new = residue(pn, vh, E, B)
        res = jnp.where(active, res_new, res)
        done = res < target
        E_new, B_new = fields_fn(rn, r0)
        still = active & ~done
        E = jnp.where(still[:, None], E_new, E)
        B = jnp.where(still[:, None], B_new, B)
        it = it + active.astype(jnp.int32)
        return (it, rn, pn, E, B, res, still)

    def cond(state):
        it, _, _, _, _, _, active = state
        return jnp.logical_and(jnp.any(active), it.max() < maxit)

    init = (
        jnp.zeros(r0.shape[0], jnp.int32),
        rn0,
        p0,
        E0,
        B0,
        res0,
        res0 >= target,
    )
    it, rn, pn, _, _, res, active = jax.lax.while_loop(cond, body, init)
    return CNResult(r=rn, p=pn, iterations=it, residual=res, converged=~active)


class DKResult(NamedTuple):
    r: jax.Array
    p_parallel: jax.Array
    p_perp: jax.Array
    iterations: jax.Array
    converged: jax.Array


def drift_kinetic_push(
    dt: float,
    qm: float,
    mp: float,
    r0: jax.Array,
    p_par0: jax.Array,
    p_perp0: jax.Array,
    mu0: jax.Array,
    fields_fn: Callable[..., tuple[jax.Array, jax.Array, jax.Array]],
    eps: float = 1e-12,
    delta: float = 1e-12,
    maxit: int = 30,
) -> DKResult:
    """Batched implicit guiding-center push
    (reference: src/algorithms/drift_kinetic_push.cpp:48-160).

    ``fields_fn(r0, rn) -> (Eh, Bp, gradBp)`` returns the electric field
    averaged over the segment and B with its gradient at the new point.
    Drift velocity (drift_kinetic_push.cpp:111-119):

        Vd = (Eh x h)/Bh + (1/qm) (Vh^2/Bh + mu/mp) h x (gradBh/Bh)

    with h the averaged unit-B direction; the update conserves the
    magnetic moment mu through |p_perp| ~ sqrt(|B|).
    """
    n = r0.shape[0]
    Eh, Bp, gradBp = fields_fn(r0, r0)
    B0v = Bp
    gradB0 = gradBp
    b0 = _normalized(Bp)

    def get_vd(Vh, h, Bh_len, gradBh, Eh):
        small = Bh_len[:, 0] < 1e-12
        Bh_safe = jnp.maximum(Bh_len, 1e-300)
        vd = jnp.cross(Eh, h) / Bh_safe + (1.0 / qm) * (
            (Vh * Vh)[:, None] / Bh_safe + (mu0 / mp)[:, None]
        ) * jnp.cross(h, gradBh / Bh_safe)
        return jnp.where(small[:, None], 0.0, vd)

    def vpar_terms(Vh, Vd, Eh, Bp_len, B0_len):
        safe = jnp.abs(Vh) >= 1e-12
        term = jnp.where(safe, jnp.sum(Eh * Vd, axis=-1) / jnp.where(safe, Vh, 1.0), 0.0)
        dB = Bp_len[:, 0] - B0_len[:, 0]
        mu_term = jnp.where(safe, (mu0 / mp) * dB / jnp.where(safe, Vh, 1.0), 0.0)
        return term, mu_term

    def body(state):
        it, rn, ppar, pperp, Eh, Bp, gradBp, h, Bh, gradBh, active, conv = state
        Vh = 0.5 * (ppar + p_par0)
        Bh_len = _norm(Bh)
        Vd = get_vd(Vh, h, Bh_len, gradBh, Eh)

        # Residuals (drift_kinetic_push.cpp:139-160)
        R1 = jnp.linalg.norm(rn - r0 - dt * (Vh[:, None] * h + Vd), axis=-1)
        term, mu_term = vpar_terms(Vh, Vd, Eh, _norm(Bp), _norm(B0v))
        R2 = jnp.abs(
            (ppar - p_par0) - dt * qm * (jnp.sum(Eh * h, axis=-1) + term) + mu_term
        )
        done = (R1 < eps) & (R2 < delta) & (it > 0)
        conv = conv | (active & done)
        still = active & ~done

        m = still[:, None]
        rn_new = r0 + dt * (Vh[:, None] * h + Vd)
        rn = jnp.where(m, rn_new, rn)

        Eh_n, Bp_n, gradBp_n = fields_fn(r0, rn)
        Eh = jnp.where(m, Eh_n, Eh)
        Bp_new = jnp.where(m, Bp_n, Bp)
        gradBp_new = jnp.where(m, gradBp_n, gradBp)
        Bh = 0.5 * (Bp_new + B0v)
        gradBh = 0.5 * (gradBp_new + gradB0)
        h = 0.5 * (_normalized(Bp_new) + b0)

        pperp_new = p_perp0 * jnp.sqrt(_norm(Bp_new)[:, 0] / _norm(B0v)[:, 0])
        term, mu_term = vpar_terms(Vh, Vd, Eh, _norm(Bp_new), _norm(B0v))
        ppar_new = p_par0 + dt * qm * (jnp.sum(Eh * h, axis=-1) + term) - mu_term
        pperp = jnp.where(still, pperp_new, pperp)
        ppar = jnp.where(still, ppar_new, ppar)

        it = it + 1
        return (it, rn, ppar, pperp, Eh, Bp_new, gradBp_new, h, Bh, gradBh, still, conv)

    def cond(state):
        it = state[0]
        active = state[10]
        return jnp.logical_and(jnp.any(active), it < maxit)

    init = (
        jnp.asarray(0, jnp.int32),
        r0,
        p_par0,
        p_perp0,
        Eh,
        Bp,
        gradBp,
        b0,
        Bp,
        gradBp,
        jnp.ones(n, bool),
        jnp.zeros(n, bool),
    )
    it, rn, ppar, pperp, *_rest = jax.lax.while_loop(cond, body, init)
    conv = _rest[-1] | ~_rest[-2]
    return DKResult(
        r=rn,
        p_parallel=ppar,
        p_perp=pperp,
        iterations=jnp.broadcast_to(it, (n,)),
        converged=conv,
    )
