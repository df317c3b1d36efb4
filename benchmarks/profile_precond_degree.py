"""Chebyshev-degree sweep for the ECSIM advance solve, on chip."""
import json, os, time
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XPIC_X64"] = "0"
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/xpic_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
import jax.numpy as jnp
import numpy as np
from xpic_tpu.config import Geometry
from xpic_tpu.ops.binning import bin_state, drift_state, rebin
from xpic_tpu.ops.gather_scatter import cell_t
from xpic_tpu.ops.stencil import curl_negative, curl_positive
from xpic_tpu.ops.ecsim_blocks import apply_blocks
from xpic_tpu.parallel.step import fill_phase
from xpic_tpu.particles import ParticleArrays, sort_by_cell
from xpic_tpu.solvers import gmres
from xpic_tpu.solvers.spectral import make_matM_preconditioner

geom = Geometry(dx=0.5, dy=0.5, dz=0.5, dt=1.5, nx=32, ny=32, nz=32, nt=1)
rng = np.random.default_rng(0)
n = geom.n_cells * 50
sp = sort_by_cell(ParticleArrays(
    r=jnp.asarray(rng.random((n, 3)) * np.array(geom.L), jnp.float32),
    p=jnp.asarray(rng.standard_normal((n, 3)) * 0.014, jnp.float32),
    alive=jnp.ones(n, bool)), geom)
st = rebin(drift_state(bin_state(sp, geom, 80), geom), geom)
t = cell_t(geom, st.r)
E = jnp.asarray(rng.standard_normal((3,) + geom.shape) * 1e-3, jnp.float32)
B = jnp.asarray(rng.standard_normal((3,) + geom.shape) * 1e-3, jnp.float32)
B0 = jnp.zeros_like(B)
currI, L, W, B_p = fill_phase(B, st, t, geom, q=-1.0, m=1.0, mpw=0.02)

dt = geom.dt
steps, bounds = geom.cell_steps, geom.bounds
half_dt2 = 0.5 * dt * dt

if isinstance(L, tuple):  # matrix-free (the f32 default)
    from xpic_tpu.ops.mass_free import mass_apply

    op, trace = L

    def matL(x):
        return mass_apply(x, (op,), geom)

    shift = trace / (3.0 * geom.n_cells)
else:
    def matL(x):
        return apply_blocks(L, x, geom)

    shift = jnp.einsum("gcici->", L) / (3.0 * geom.n_cells)


def matA(x):
    y = 2.0 * x + half_dt2 * curl_negative(
        curl_positive(x, steps, bounds), steps, bounds)
    return y + matL(x)

rhs = 2.0 * E - dt * currI + dt * curl_negative(B - B0, steps, bounds)

def solve(degree):
    P = make_matM_preconditioner(geom, dt, degree=degree)
    M_inv = (lambda v: P(v, shift)) if degree > 0 else None
    return gmres(matA, rhs, x0=0.5 * rhs, rtol=1e-5, atol=1e-5, maxit=100,
                 M_inv=M_inv)

res = {}
for deg in (0, 6, 12, 20, 28):
    f = jax.jit(lambda: solve(deg))
    sol = f(); _ = float(jnp.sum(sol.x))
    t0 = time.perf_counter()
    reps = 5
    for _i in range(reps):
        sol = f(); _ = float(jnp.sum(sol.x))
    ms = (time.perf_counter() - t0) / reps * 1e3
    res[f"deg{deg}"] = {"ms": round(ms, 2), "iters": int(sol.iterations),
                        "ok": bool(sol.converged)}
print(json.dumps(res))
