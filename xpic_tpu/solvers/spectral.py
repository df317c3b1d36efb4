"""Polynomial (Chebyshev) preconditioner for the ECSIM field operator.

The ECSIM system matrix is matA = matL + matM with
matM = (2 + c) I + beta curl- curl+ (beta = dt^2/2, c absorbs the mean
matL diagonal).  matM is SPD with a spectrum bounded by Gershgorin:

    lambda in [2 + c,  2 + c + 4 beta (1/dx^2 + 1/dy^2 + 1/dz^2)]

(the discrete curl-curl's largest eigenvalue is at most
4 sum_a 1/d_a^2).  A degree-k Chebyshev semi-iteration approximates
matM^{-1} using only k curl-curl stencil applications — no FFTs, no
factorizations, valid for every boundary kind, trivially sharded by
GSPMD.  Preconditioning the GMRES solve with it collapses the
curl-curl-driven spread of matA's spectrum, cutting the iteration count
severalfold (the reference leans on PETSc ILU/Jacobi here instead;
src/impls/ecsim/simulation.cpp:555-566).

An rFFT-exact inverse also exists for fully periodic boxes (the Yee
curls are circulant there, so matM block-diagonalizes into 3x3
Hermitian systems per Fourier mode) — ``XPIC_PRECOND=fft`` opts in.
Measured on v5e at the 32^3 bench shape it LOSES to Chebyshev(12):
the warm GMRES iteration count (4) is set by the mass-matrix part of
matA, not the curl-curl part, so the exactness buys no iterations
while each apply pays the FFT round trip (44.7M vs 68M+
particle-steps/s fused).  Kept as an option for stiffer dt regimes
where the curl-curl term dominates.
"""

from __future__ import annotations

import os
from functools import lru_cache, partial

import jax
import jax.numpy as jnp

from ..config import PERIODIC, Geometry
from ..ops.stencil import curl_negative, curl_positive

# Resolved at import per the repo's jit-cache rule (env reads at trace
# time are invisible to the cache key).
_PRECOND_MODE = os.environ.get("XPIC_PRECOND", "cheb")
_CHEB_DEGREE = int(os.environ.get("XPIC_CHEB_DEGREE", "12"))


def matM_bounds(geom: Geometry, dt: float, shift=0.0):
    beta = 0.5 * dt * dt
    lam_cc = 4.0 * (1.0 / geom.dx**2 + 1.0 / geom.dy**2 + 1.0 / geom.dz**2)
    a = 2.0 + shift
    b = 2.0 + shift + beta * lam_cc
    return a, b


@lru_cache(maxsize=None)
def _matM_symbol(geom: Geometry, dt: float):
    """rFFT symbol of beta curl- curl+ as a numpy constant
    [3(out), 3(in), nz, ny, nx//2+1] complex64: the operator is
    translation-invariant on a periodic box, so its action on the
    three unit impulses yields the exact convolution kernels.  Pure
    numpy (a direct replica of the periodic branch of ops/stencil) so
    the symbol stays a compile-time constant even when this factory is
    invoked during a jit trace."""
    import numpy as np

    dx, dy, dz = geom.cell_steps
    beta = 0.5 * dt * dt

    def sh(f, axis, by):  # result[i] = f[i + by]; trailing axes (z, y, x)
        ax = f.ndim - 1 - "xyz".index(axis)
        return np.roll(f, -by, axis=ax)

    def dp(f, axis, step):
        return (sh(f, axis, 1) - f) / step

    def dm(f, axis, step):
        return (f - sh(f, axis, -1)) / step

    def curlp(F):
        return np.stack([
            dp(F[2], "y", dy) - dp(F[1], "z", dz),
            dp(F[0], "z", dz) - dp(F[2], "x", dx),
            dp(F[1], "x", dx) - dp(F[0], "y", dy),
        ])

    def curlm(F):
        return np.stack([
            dm(F[2], "y", dy) - dm(F[1], "z", dz),
            dm(F[0], "z", dz) - dm(F[2], "x", dx),
            dm(F[1], "x", dx) - dm(F[0], "y", dy),
        ])

    cols = []
    for c in range(3):
        delta = np.zeros((3,) + geom.shape, np.float64)
        delta[c, 0, 0, 0] = 1.0
        resp = beta * curlm(curlp(delta))
        cols.append(np.fft.rfftn(resp, axes=(1, 2, 3)))
    return np.stack(cols, axis=1).astype(np.complex64)


def _inv3x3(M):
    """Batched cofactor inverse of [3, 3, ...] complex matrices
    (closed form — complex LU is not available on every TPU
    toolchain; matM's modes are 2+shift-diagonally-dominant Hermitian
    so the determinant is bounded away from zero)."""
    a, b, c = M[0, 0], M[0, 1], M[0, 2]
    d, e, f = M[1, 0], M[1, 1], M[1, 2]
    g, h, i = M[2, 0], M[2, 1], M[2, 2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I_ = a * e - b * d
    det = a * A + b * D + c * G
    return jnp.stack([
        jnp.stack([A, B, C]),
        jnp.stack([D, E, F]),
        jnp.stack([G, H, I_]),
    ]) / det


def _make_fft_inverse(geom: Geometry, dt: float):
    """Exact P_inv(r, shift) = (matM + shift I)^{-1} r via the rFFT
    block-diagonalization (periodic bounds only)."""
    Hk = jnp.asarray(_matM_symbol(geom, dt))
    axes = (1, 2, 3)

    def P_inv(rhs, shift=0.0):
        eye = jnp.eye(3, dtype=Hk.dtype)[:, :, None, None, None]
        Mi = _inv3x3(Hk + (2.0 + shift) * eye)
        R = jnp.fft.rfftn(rhs, axes=axes)
        Y = jnp.stack(
            [sum(Mi[a, b] * R[b] for b in range(3)) for a in range(3)]
        )
        return jnp.fft.irfftn(Y, axes=axes, s=geom.shape).astype(rhs.dtype)

    return P_inv


def _cheb_pallas_usable(geom: Geometry, dtype, mesh) -> bool:
    """Route the Chebyshev recurrence through the fused single-dispatch
    Pallas kernel (ops/pallas_stencil) when it is exact to do so: f32,
    no mesh (under GSPMD the XLA shifts must become halo collectives),
    a lane-tileable shape, and a single visible device (pl.pallas_call
    has no SPMD partitioning rule; the multi-device CPU test fixture
    keeps the XLA form)."""
    from ..ops.pallas_stencil import cheb_pallas_ok

    if _PRECOND_MODE == "nopallas" or mesh is not None:
        return False
    if dtype != jnp.float32 or jax.config.jax_enable_x64:
        return False
    if not cheb_pallas_ok(geom, dtype):
        return False
    try:
        if len(jax.devices()) != 1:
            return False
        platform = jax.devices()[0].platform
    except Exception:  # pragma: no cover - no backend
        return False
    return platform in ("tpu", "axon", "cpu")


def make_matM_preconditioner(geom: Geometry, dt: float, degree: int = 12,
                             dtype=None, mesh=None):
    """Return P_inv(r, shift=0.0) ~ (matM + shift I)^{-1} r.

    Default: a degree-``degree`` Chebyshev semi-iteration (Saad,
    Iterative Methods, Alg. 12.1), fused into one Pallas dispatch when
    eligible (:func:`_cheb_pallas_usable`); ``XPIC_PRECOND=fft`` swaps
    in the exact rFFT inverse on fully periodic f32 boxes (see module
    docstring for why that is not the default)."""
    if (_PRECOND_MODE == "fft" and dtype == jnp.float32
            and all(b == PERIODIC for b in geom.bounds)):
        return _make_fft_inverse(geom, dt)
    degree = _CHEB_DEGREE if degree == 12 else degree
    if _cheb_pallas_usable(geom, dtype, mesh):
        from ..ops.pallas_stencil import cheb_matM_inv_pallas

        interp = jax.devices()[0].platform not in ("tpu", "axon")

        def P_inv_pallas(rhs, shift=0.0):
            return cheb_matM_inv_pallas(rhs, shift, geom=geom,
                                        degree=degree, dt=dt,
                                        interpret=interp)

        return P_inv_pallas
    steps, bounds = geom.cell_steps, geom.bounds
    beta = 0.5 * dt * dt

    def P_inv(rhs, shift=0.0):
        def Mv(v):
            return (2.0 + shift) * v + beta * curl_negative(
                curl_positive(v, steps, bounds), steps, bounds
            )

        a, b = matM_bounds(geom, dt, 0.0)
        a = a + shift
        b = b + shift
        theta = 0.5 * (b + a)
        delta = 0.5 * (b - a)
        sigma1 = theta / delta

        x = jnp.zeros_like(rhs)
        r = rhs
        d = rhs / theta
        rho = 1.0 / sigma1

        def body(_, state):
            x, r, d, rho = state
            x = x + d
            r = r - Mv(d)
            rho_new = 1.0 / (2.0 * sigma1 - rho)
            d = rho_new * rho * d + (2.0 * rho_new / delta) * r
            return (x, r, d, rho_new)

        x, r, d, rho = jax.lax.fori_loop(0, degree, body, (x, r, d, rho))
        return x

    return P_inv
