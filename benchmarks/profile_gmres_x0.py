"""A/B the GMRES initial guess in the ECSIM field advance: x0 = E
(current) vs x0 = rhs/2 (first-order predictor: E - dt/2 J + dt/2
curl(B-B0)) — iterations and wall time over a 20-step run."""
import os, time, json
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("XPIC_X64", "0")
import jax, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/xpic_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
import jax.numpy as jnp
from functools import partial
from xpic_tpu.config import Geometry
from xpic_tpu.ops.binning import bin_state, drift_state, rebin
from xpic_tpu.ops.gather_scatter import cell_t
from xpic_tpu.ops.stencil import curl_negative, curl_positive
from xpic_tpu.parallel.step import fill_phase, push_phase
from xpic_tpu.particles import ParticleArrays
from xpic_tpu.solvers.krylov import gmres
from xpic_tpu.solvers.spectral import make_matM_preconditioner
from xpic_tpu.ops.ecsim_blocks import apply_blocks

n, ppc, K = 32, 50, 80
geom = Geometry(dx=0.5, dy=0.5, dz=0.5, dt=1.5, nx=n, ny=n, nz=n, nt=1)
rng = np.random.default_rng(0)
N = geom.n_cells * ppc
sp = ParticleArrays(
    r=jnp.asarray(rng.random((N, 3)) * np.array(geom.L), jnp.float32),
    p=jnp.asarray(rng.standard_normal((N, 3)) * 0.014, jnp.float32),
    alive=jnp.ones(N, bool))
shape = (3, n, n, n)
dt = geom.dt


@partial(jax.jit, static_argnames=("x0_mode",))
def step(E, B, st, x0_mode):
    st = rebin(drift_state(st, geom), geom)
    t = cell_t(geom, st.r)
    currI, L, W, B_p = fill_phase(B, st, t, geom, q=-1.0, m=1.0, mpw=1.0/ppc)
    steps, bounds = geom.cell_steps, geom.bounds
    half_dt2 = 0.5 * dt * dt

    def matA(x):
        y = 2.0 * x + half_dt2 * curl_negative(
            curl_positive(x, steps, bounds), steps, bounds)
        return y + apply_blocks(L, x, geom)

    rhs = 2.0 * E - dt * currI + dt * curl_negative(B, steps, bounds)
    P = make_matM_preconditioner(geom, dt, dtype=E.dtype)
    shift = jnp.einsum("gcici->", L) / (3.0 * geom.n_cells)
    M_inv = (lambda v: P(v, shift)) if P is not None else None
    x0 = E if x0_mode == "E" else 0.5 * rhs
    sol = gmres(matA, rhs, x0=x0, rtol=1e-5, atol=1e-5, maxit=100,
                M_inv=M_inv)
    Ep = sol.x
    st = push_phase(Ep, st, t, W, B_p, geom, qm=-1.0)
    E2 = 2.0 * Ep - E
    B2 = B - dt * curl_positive(Ep, steps, bounds)
    return E2, B2, st, sol.iterations

for mode in ("E", "halfrhs"):
    st = bin_state(sp, geom, K)
    E = jnp.zeros(shape, jnp.float32)
    B = jnp.zeros(shape, jnp.float32)
    iters = []
    E, B, st, it = step(E, B, st, mode)  # compile
    _ = float(jnp.sum(E))
    t0 = time.perf_counter()
    for _ in range(20):
        E, B, st, it = step(E, B, st, mode)
        iters.append(int(it))
    _ = float(jnp.sum(E))
    el = (time.perf_counter() - t0) / 20 * 1e3
    print(json.dumps({"x0": mode, "iters": iters, "step_ms": el}))
