"""Anderson-accelerated fixed-point/nonlinear solver.

TPU-native replacement for the reference's SNES NGMRES solve
(src/impls/eccapfim/simulation.cpp:358-392; tolerances
atol=rtol=stol=1e-7, maxit=1000).  PETSc's NGMRES is Anderson mixing
over a residual window; this implements Anderson(m) over device arrays
with least-squares mixing.

The outer iteration is a host loop (the count is data-dependent and
each evaluation is a full jitted particle sweep in eccapfim), but all
vector algebra stays on device: the window history is a list of device
arrays, the least-squares reduces to a (k x k) normal-equation solve,
and the only host traffic per iteration is two scalars (residual and
step norms) — no full-field round trips.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class NonlinearResult(NamedTuple):
    x: jnp.ndarray
    iterations: int
    residual_norm: float
    converged: bool
    history: list


@jax.jit
def _mix(Xs, Fs, damping):
    """One Anderson update from the stacked window (device-side).

    ``Xs``/``Fs`` are [k, n] with the newest entry last.  Solves the
    regularized normal equations of min || F_k + dF gamma || and returns
    (x_new, |F_k|, |x_new - X_k|).
    """
    xk = Xs[-1]
    Fk = Fs[-1]
    rnorm = jnp.linalg.norm(Fk)
    dF = (Fs[:-1] - Fk).T  # [n, k-1]
    dX = (Xs[:-1] - xk).T
    G = dF.T @ dF
    scale = jnp.maximum(jnp.trace(G), 1e-300)
    G = G + (1e-12 * scale) * jnp.eye(G.shape[0], dtype=G.dtype)
    gamma = jnp.linalg.solve(G, -(dF.T @ Fk))
    x_new = xk + dX @ gamma - damping * (Fk + dF @ gamma)
    return x_new, rnorm, jnp.linalg.norm(x_new - xk)


@jax.jit
def _first_step(x, F, damping):
    return x - damping * F, jnp.linalg.norm(F)


def anderson_solve(residual_fn: Callable, x0, *, m: int = 10,
                   atol: float = 1e-7, rtol: float = 1e-7,
                   stol: float = 1e-7, maxit: int = 1000,
                   damping: float = 1.0) -> NonlinearResult:
    """Solve F(x) = 0 by Anderson mixing of the fixed-point x - F(x).

    ``residual_fn(x) -> F(x)`` (same shape as x).
    """
    shape = jnp.shape(x0)
    dtype = jnp.asarray(x0).dtype
    damp = jnp.asarray(damping, dtype)

    xf = jnp.asarray(x0).reshape(-1)
    F = residual_fn(x0)
    Ff = jnp.asarray(F).reshape(-1)
    r0 = float(jnp.linalg.norm(Ff))
    target = max(atol, rtol * r0)
    history = [r0]
    if r0 <= atol:
        return NonlinearResult(x0, 0, r0, True, history)

    X_hist: list[jnp.ndarray] = []
    F_hist: list[jnp.ndarray] = []

    for it in range(1, maxit + 1):
        X_hist.append(xf)
        F_hist.append(Ff)
        if len(X_hist) > m + 1:
            X_hist.pop(0)
            F_hist.pop(0)

        if len(X_hist) == 1:
            x_new, _ = _first_step(xf, Ff, damp)
            step_d = jnp.linalg.norm(x_new - xf)
        else:
            x_new, _, step_d = _mix(
                jnp.stack(X_hist), jnp.stack(F_hist), damp
            )

        xf = x_new
        F = residual_fn(xf.reshape(shape))
        Ff = jnp.asarray(F).reshape(-1)

        # One host fetch per iteration: [residual, step, solution] norms.
        rnorm, step, xnorm = (
            float(v) for v in np.asarray(
                jnp.stack([jnp.linalg.norm(Ff), step_d, jnp.linalg.norm(xf)])
            )
        )
        history.append(rnorm)

        if rnorm <= target:
            return NonlinearResult(xf.reshape(shape), it, rnorm, True, history)
        # PETSc CONVERGED_SNORM_RELATIVE analog: a relative step below
        # stol counts as converged (SNESSetTolerances stol, used by the
        # reference at eccapfim/simulation.cpp:371).
        if step <= stol * max(xnorm, 1.0):
            return NonlinearResult(xf.reshape(shape), it, rnorm, True, history)

    return NonlinearResult(xf.reshape(shape), maxit, history[-1], False,
                           history)
