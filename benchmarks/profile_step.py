"""Per-phase timing of the fused ECSIM step at bench shape on the real chip."""
import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("XPIC_X64", "0")
import jax, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/xpic_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
import jax.numpy as jnp
from functools import partial
from xpic_tpu.config import Geometry
from xpic_tpu.ops.binning import BinnedState, bin_state, _drift_impl, _rebin_core
from xpic_tpu.ops.gather_scatter import cell_t
from xpic_tpu.parallel.step import fill_phase, advance_phase, push_phase
from xpic_tpu.particles import ParticleArrays

n = int(os.environ.get("BENCH_GRID", "32")); ppc = 50
geom = Geometry(dx=0.5, dy=0.5, dz=0.5, dt=1.5, nx=n, ny=n, nz=n, nt=1)
rng = np.random.default_rng(0)
N = geom.n_cells * ppc
r = rng.random((N,3)) * np.array(geom.L)
p = rng.standard_normal((N,3)) * 0.014
sp = ParticleArrays(r=jnp.asarray(r, jnp.float32), p=jnp.asarray(p, jnp.float32), alive=jnp.ones(N, bool))
slots = int(os.environ.get("BENCH_SLOTS", "64"))
st = bin_state(sp, geom, slots)
shape = (3, n, n, n)
E = jnp.zeros(shape, jnp.float32); B = jnp.zeros(shape, jnp.float32); B0 = jnp.zeros(shape, jnp.float32)
q, m, mpw = -1.0, 1.0, 0.25

@partial(jax.jit, static_argnames=("geom",))
def ph_rebin(st, geom):
    return _rebin_core(_drift_impl(st, geom), geom)[0]

@partial(jax.jit, static_argnames=("geom",))
def ph_fill(B, st, geom):
    t = cell_t(geom, st.r)
    currI, L, W, B_p = fill_phase(B, st, t, geom, q=q, m=m, mpw=mpw)
    return currI, L, W, B_p, t

@partial(jax.jit, static_argnames=("geom","maxit"))
def ph_advance(E, B, B0, currI, L, geom, maxit=100):
    return advance_phase(E, B, B0, currI, L, geom, tol=1e-5, maxit=maxit)[0]

@partial(jax.jit, static_argnames=("geom",))
def ph_push(Ep, st, t, W, B_p, geom):
    return push_phase(Ep, st, t, W, B_p, geom, qm=q/m)

def _fence(out):
    # A real readback is the only reliable fence on this backend.
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            return float(jnp.sum(leaf))
    return None

def timeit(f, *args, reps=10):
    out = f(*args); _fence(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    _fence(out)
    return (time.perf_counter() - t0) / reps, out

t_rebin, st2 = timeit(ph_rebin, st, geom)
t_fill, (currI, L, W, B_p, t) = timeit(ph_fill, B, st2, geom)
t_adv, sol = timeit(ph_advance, E, B, B0, currI, L, geom)
t_push, st3 = timeit(ph_push, E, st2, t, W, B_p, geom)
total = t_rebin + t_fill + t_adv + t_push
print(json.dumps(dict(
    rebin_ms=t_rebin*1e3, fill_ms=t_fill*1e3, advance_ms=t_adv*1e3,
    push_ms=t_push*1e3, total_ms=total*1e3,
    ksp_iters=int(sol.iterations),
    implied_throughput=N/total,
)))
