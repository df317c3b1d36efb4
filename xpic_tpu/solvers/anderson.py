"""Anderson-accelerated fixed-point/nonlinear solver.

TPU-native replacement for the reference's SNES NGMRES solve
(src/impls/eccapfim/simulation.cpp:358-392; tolerances
atol=rtol=stol=1e-7, maxit=1000).  PETSc's NGMRES is Anderson mixing
over a residual window; this implements Anderson(m) over pytree states
with least-squares mixing, as a host-level loop so the (expensive)
residual evaluation can itself be a jitted function.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax.numpy as jnp
import numpy as np


class NonlinearResult(NamedTuple):
    x: jnp.ndarray
    iterations: int
    residual_norm: float
    converged: bool
    history: list


def anderson_solve(residual_fn: Callable, x0, *, m: int = 10,
                   atol: float = 1e-7, rtol: float = 1e-7,
                   stol: float = 1e-7, maxit: int = 1000,
                   damping: float = 1.0) -> NonlinearResult:
    """Solve F(x) = 0 by Anderson mixing of the fixed-point x - F(x).

    ``residual_fn(x) -> F(x)`` (same shape as x).  Runs as a host loop
    (the iteration count is data-dependent and each evaluation is a full
    jitted particle sweep in eccapfim), with the mixing algebra in numpy
    on flattened residual windows — tiny compared to one residual eval.
    """
    x = x0
    F = residual_fn(x)
    r0 = float(jnp.linalg.norm(F))
    target = max(atol, rtol * r0)
    history = [r0]
    if r0 <= atol:
        return NonlinearResult(x, 0, r0, True, history)

    X_hist: list[np.ndarray] = []
    F_hist: list[np.ndarray] = []
    xf = np.asarray(x).reshape(-1)
    Ff = np.asarray(F).reshape(-1)

    for it in range(1, maxit + 1):
        X_hist.append(xf.copy())
        F_hist.append(Ff.copy())
        if len(X_hist) > m + 1:
            X_hist.pop(0)
            F_hist.pop(0)

        k = len(X_hist)
        if k == 1:
            x_new = xf - damping * Ff
        else:
            # Minimize || F_k + sum_i gamma_i (F_i - F_k) || over the window.
            dF = np.stack([F_hist[i] - F_hist[-1] for i in range(k - 1)], axis=1)
            dX = np.stack([X_hist[i] - X_hist[-1] for i in range(k - 1)], axis=1)
            gamma, *_ = np.linalg.lstsq(dF, -F_hist[-1], rcond=None)
            x_new = (
                X_hist[-1] + dX @ gamma
                - damping * (F_hist[-1] + dF @ gamma)
            )

        xf = x_new
        x = jnp.asarray(xf.reshape(np.asarray(x0).shape), dtype=jnp.asarray(x0).dtype)
        F = residual_fn(x)
        Ff = np.asarray(F).reshape(-1)
        rnorm = float(np.linalg.norm(Ff))
        history.append(rnorm)

        if rnorm <= target:
            return NonlinearResult(x, it, rnorm, True, history)
        # PETSc CONVERGED_SNORM_RELATIVE analog: a relative step below
        # stol counts as converged (SNESSetTolerances stol, used by the
        # reference at eccapfim/simulation.cpp:371).
        step = np.linalg.norm(xf - X_hist[-1])
        if step <= stol * max(np.linalg.norm(xf), 1.0):
            return NonlinearResult(x, it, rnorm, True, history)

    return NonlinearResult(x, maxit, history[-1], False, history)
