"""Conjugate-gradient and restarted GMRES over JAX arrays.

Solver budget defaults follow the reference
(src/impls/ecsim/simulation.h:15-18): rtol=atol=1e-7, maxit=100, and the
caller is expected to treat non-convergence as fatal
(KSPSetErrorIfNotConverged, ecsim/simulation.cpp:562).

Implementation notes for TPU:
* fixed-trip-count ``lax.while_loop`` with convergence masks — no
  data-dependent Python control flow;
* all dot products are full-array reductions, which XLA turns into
  ``psum`` collectives when the operands are sharded over a mesh;
* GMRES uses modified Gram-Schmidt on a statically-shaped Krylov basis
  (restart length fixed at trace time).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class KrylovResult(NamedTuple):
    x: jax.Array
    iterations: jax.Array
    residual_norm: jax.Array
    converged: jax.Array


def _dot(a, b):
    return jnp.sum(a * b)


def cg(matvec: Callable, b, x0=None, *, rtol: float = 1e-7,
       atol: float = 1e-7, maxit: int = 100, M_inv: Callable | None = None
       ) -> KrylovResult:
    """(Preconditioned) conjugate gradient for SPD operators.

    Used for the ecsimcorr ``correct`` solve on the constant SPD matrix
    matM = 2I + 0.5 dt^2 rotB rotE (src/impls/ecsimcorr/simulation.cpp:118-133),
    with a Chebyshev polynomial approximation of matM^{-1} as ``M_inv``
    (solvers/spectral.py).
    Convergence is tested on the true residual 2-norm.
    """
    x0 = jnp.zeros_like(b) if x0 is None else x0
    if M_inv is None:
        M_inv = lambda r: r  # noqa: E731
    r0 = b - matvec(x0)
    z0 = M_inv(r0)
    target = jnp.maximum(rtol * jnp.sqrt(_dot(b, b)), atol)

    def body(state):
        x, r, z, p, rz, it, _ = state
        Ap = matvec(p)
        alpha = rz / _dot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M_inv(r)
        rz_new = _dot(r, z)
        beta = rz_new / rz
        p = z + beta * p
        return (x, r, z, p, rz_new, it + 1, jnp.sqrt(_dot(r, r)))

    def cond(state):
        *_, it, rnorm = state
        return jnp.logical_and(rnorm > target, it < maxit)

    state = (x0, r0, z0, z0, _dot(r0, z0), jnp.asarray(0),
             jnp.sqrt(_dot(r0, r0)))
    x, r, z, p, rz, it, rnorm = jax.lax.while_loop(cond, body, state)
    return KrylovResult(x, it, rnorm, rnorm <= target)


def _gmres_cycle(matvec, b, x0, m, target):
    """One GMRES(m) cycle with Givens-rotation QR; returns (x, rnorm, j).

    Standard incremental least squares: each Arnoldi column is rotated
    into upper-triangular form and the residual norm is |g[j+1]| for
    free, so the inner loop exits as soon as the target is met and a
    happy breakdown (lucky exact solve) is handled without forming the
    (possibly singular) normal equations.
    """
    dtype = b.dtype
    shape = b.shape
    tiny = jnp.asarray(np.finfo(np.dtype(dtype)).tiny * 1e4, dtype)

    r0 = b - matvec(x0)
    beta = jnp.sqrt(_dot(r0, r0))

    V = jnp.zeros((m + 1,) + shape, dtype)
    V = V.at[0].set(r0 / jnp.maximum(beta, tiny))
    R = jnp.zeros((m, m), dtype)  # upper-triangular factor
    g = jnp.zeros(m + 1, dtype).at[0].set(beta)
    cs = jnp.zeros(m, dtype)
    sn = jnp.zeros(m, dtype)

    def body(state):
        j, V, R, g, cs, sn, _ = state
        w = matvec(V[j])

        # Re-orthogonalized classical Gram-Schmidt (CGS2) against basis
        # vectors <= j: two rounds of (all dots as one contraction, one
        # basis-weighted subtraction).  One MXU pass over the basis per
        # round instead of m+1 sequential loop trips — the TPU-friendly
        # replacement for per-vector MGS at equal (re-orthogonalized)
        # stability.  The dots contract the field axes IN SHAPE (no
        # reshape to [m+1, n]): merging a GSPMD-sharded grid axis into
        # a flat dim makes the partitioner all-gather the whole Krylov
        # basis per iteration (measured 6 MB/iteration of O(volume)
        # all-gathers on an 8-device mesh, benchmarks/profile_scaling);
        # the in-shape contraction keeps the partial dots shard-local
        # with one scalar all-reduce.  precision="highest": f32 dots
        # drop to bf16 multiplies on TPU by default.
        vdims = tuple(range(1, V.ndim))
        wdims = tuple(range(w.ndim))
        dot = partial(jnp.tensordot, precision="highest")
        active = (jnp.arange(m + 1) <= j).astype(dtype)
        h1 = dot(V, w, axes=(vdims, wdims)) * active
        w = w - dot(h1, V, axes=1)
        h2 = dot(V, w, axes=(vdims, wdims)) * active
        w = w - dot(h2, V, axes=1)
        h = jnp.zeros(m + 1, dtype) + h1 + h2
        hnorm = jnp.sqrt(_dot(w, w))
        V = V.at[j + 1].set(w / jnp.maximum(hnorm, tiny))

        # Apply accumulated rotations to the new column (sequential by
        # nature, but only up to column j).
        def rot(i, h):
            hi = cs[i] * h[i] + sn[i] * h[i + 1]
            hip = -sn[i] * h[i] + cs[i] * h[i + 1]
            return h.at[i].set(hi).at[i + 1].set(hip)

        h = h.at[j + 1].set(hnorm)
        h = jax.lax.fori_loop(0, j, rot, h)

        # New rotation to annihilate h[j+1].
        denom = jnp.sqrt(h[j] ** 2 + h[j + 1] ** 2)
        safe = jnp.maximum(denom, tiny)
        c = jnp.where(denom > tiny, h[j] / safe, 1.0)
        s = jnp.where(denom > tiny, h[j + 1] / safe, 0.0)
        cs = cs.at[j].set(c)
        sn = sn.at[j].set(s)
        h = h.at[j].set(c * h[j] + s * h[j + 1]).at[j + 1].set(0.0)

        R = R.at[:, j].set(h[:m])
        gj = g[j]
        g = g.at[j].set(c * gj).at[j + 1].set(-s * gj)
        rnorm = jnp.abs(g[j + 1])
        return (j + 1, V, R, g, cs, sn, rnorm)

    def cond(state):
        j, *_, rnorm = state
        return jnp.logical_and(j < m, rnorm > target)

    state = (jnp.asarray(0), V, R, g, cs, sn, beta)
    j, V, R, g, cs, sn, rnorm = jax.lax.while_loop(cond, body, state)

    # Back substitution on the leading j x j block (masked to size m).
    def back(i_rev, y):
        i = m - 1 - i_rev
        active = i < j
        num = g[i] - jnp.dot(R[i], y)
        diag = jnp.where(jnp.abs(R[i, i]) > tiny, R[i, i], 1.0)
        return y.at[i].set(jnp.where(active, num / diag, 0.0))

    y = jax.lax.fori_loop(0, m, back, jnp.zeros(m, dtype))
    x = x0 + jnp.tensordot(y, V[:m], axes=1, precision="highest")
    return x, rnorm, j


def gmres(matvec: Callable, b, x0=None, *, rtol: float = 1e-7,
          atol: float = 1e-7, maxit: int = 100, restart: int = 30,
          M_inv: Callable | None = None) -> KrylovResult:
    """Restarted GMRES for the nonsymmetric ECSIM operator
    matA = matL + matM (src/impls/ecsim/simulation.cpp:191-208).

    ``maxit`` counts total inner iterations, as PETSc's does.  With
    ``M_inv`` the solve is left-preconditioned (PETSc's default side)
    and convergence is tested on the preconditioned residual norm —
    also PETSc's default (KSP_NORM_PRECONDITIONED).
    """
    x0 = jnp.zeros_like(b) if x0 is None else x0
    if M_inv is not None:
        inner = lambda v: M_inv(matvec(v))  # noqa: E731
        b_eff = M_inv(b)
    else:
        inner = matvec
        b_eff = b
    bnorm = jnp.sqrt(_dot(b_eff, b_eff))
    target = jnp.maximum(rtol * bnorm, atol)

    def body(state):
        x, it, rnorm = state
        x, rnorm, j = _gmres_cycle(inner, b_eff, x, restart, target)
        return (x, it + j, rnorm)

    def cond(state):
        _, it, rnorm = state
        return jnp.logical_and(rnorm > target, it < maxit)

    r0 = b_eff - inner(x0)
    state = (x0, jnp.asarray(0), jnp.sqrt(_dot(r0, r0)))
    x, it, rnorm = jax.lax.while_loop(cond, body, state)
    return KrylovResult(x, it, rnorm, rnorm <= target)
