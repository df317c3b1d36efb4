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
       atol: float = 1e-7, maxit: int = 100) -> KrylovResult:
    """Preconditioner-free conjugate gradient for SPD operators.

    Used for the ecsimcorr ``correct`` solve on the constant SPD matrix
    matM = 2I + 0.5 dt^2 rotB rotE (src/impls/ecsimcorr/simulation.cpp:118-133).
    """
    x0 = jnp.zeros_like(b) if x0 is None else x0
    r0 = b - matvec(x0)
    target = jnp.maximum(rtol * jnp.sqrt(_dot(b, b)), atol)

    def body(state):
        x, r, p, rs, it, _ = state
        Ap = matvec(p)
        alpha = rs / _dot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        rs_new = _dot(r, r)
        beta = rs_new / rs
        p = r + beta * p
        return (x, r, p, rs_new, it + 1, jnp.sqrt(rs_new))

    def cond(state):
        *_, it, rnorm = state
        return jnp.logical_and(rnorm > target, it < maxit)

    rs0 = _dot(r0, r0)
    state = (x0, r0, r0, rs0, jnp.asarray(0), jnp.sqrt(rs0))
    x, r, p, rs, it, rnorm = jax.lax.while_loop(cond, body, state)
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

    # Solve the (m+1) x m least-squares min ||beta e1 - H y|| by normal
    # equations on the small Hessenberg system (m is small and static).
    e1 = jnp.zeros(m + 1, dtype).at[0].set(beta)
    y = jnp.linalg.lstsq(H, e1)[0]
    dx = jnp.tensordot(y, V[:m], axes=1)
    x = x0 + dx
    r = b - matvec(x)
    return x, jnp.sqrt(_dot(r, r))


def gmres(matvec: Callable, b, x0=None, *, rtol: float = 1e-7,
          atol: float = 1e-7, maxit: int = 100, restart: int = 30
          ) -> KrylovResult:
    """Restarted GMRES for the nonsymmetric ECSIM operator
    matA = matL + matM (src/impls/ecsim/simulation.cpp:191-208).

    ``maxit`` counts total inner iterations, as PETSc's does.
    """
    x0 = jnp.zeros_like(b) if x0 is None else x0
    bnorm = jnp.sqrt(_dot(b, b))
    target = jnp.maximum(rtol * bnorm, atol)
    n_cycles = max(1, -(-maxit // restart))

    def body(state):
        x, it, rnorm = state
        x, rnorm = _gmres_cycle(matvec, b, x, restart, target)
        return (x, it + restart, rnorm)

    def cond(state):
        _, it, rnorm = state
        return jnp.logical_and(rnorm > target, it < maxit)

    r0 = b - matvec(x0)
    state = (x0, jnp.asarray(0), jnp.sqrt(_dot(r0, r0)))
    x, it, rnorm = jax.lax.while_loop(cond, body, state)
    return KrylovResult(x, it, rnorm, rnorm <= target)
