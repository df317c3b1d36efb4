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
    with the exact spectral inverse of matM available as ``M_inv``.
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
    """One GMRES(m) cycle; returns updated x and residual norm."""
    dtype = b.dtype
    shape = b.shape
    n_flat = b.size

    r0 = b - matvec(x0)
    beta = jnp.sqrt(_dot(r0, r0))

    # Krylov basis as [m+1, ...] stacked array.
    V = jnp.zeros((m + 1,) + shape, dtype)
    V = V.at[0].set(r0 / jnp.maximum(beta, 1e-300))
    H = jnp.zeros((m + 1, m), dtype)

    def arnoldi_step(j, carry):
        V, H = carry
        w = matvec(V[j])

        # Modified Gram-Schmidt against all basis vectors (masked to <= j).
        def mgs(i, wh):
            w, H = wh
            hij = _dot(V[i], w)
            use = i <= j
            hij = jnp.where(use, hij, 0.0)
            w = w - hij * V[i]
            H = H.at[i, j].set(hij)
            return (w, H)

        w, H = jax.lax.fori_loop(0, m + 1, mgs, (w, H))
        hnorm = jnp.sqrt(_dot(w, w))
        H = H.at[j + 1, j].set(hnorm)
        V = V.at[j + 1].set(w / jnp.maximum(hnorm, 1e-300))
        return (V, H)

    V, H = jax.lax.fori_loop(0, m, arnoldi_step, (V, H))

    # Solve the (m+1) x m least-squares min ||beta e1 - H y|| via the
    # normal equations of the small Hessenberg system — m is tiny and
    # static, and H^T H is well-conditioned at restart lengths ~30
    # (avoids jnp.linalg.lstsq's SVD, which is slow on TPU).
    e1 = jnp.zeros(m + 1, dtype).at[0].set(beta)
    HtH = H.T @ H + 1e-30 * jnp.eye(m, dtype=dtype)
    y = jnp.linalg.solve(HtH, H.T @ e1)
    dx = jnp.tensordot(y, V[:m], axes=1)
    x = x0 + dx
    r = b - matvec(x)
    return x, jnp.sqrt(_dot(r, r))


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
        x, rnorm = _gmres_cycle(inner, b_eff, x, restart, target)
        return (x, it + restart, rnorm)

    def cond(state):
        _, it, rnorm = state
        return jnp.logical_and(rnorm > target, it < maxit)

    r0 = b_eff - inner(x0)
    state = (x0, jnp.asarray(0), jnp.sqrt(_dot(r0, r0)))
    x, it, rnorm = jax.lax.while_loop(cond, body, state)
    return KrylovResult(x, it, rnorm, rnorm <= target)
