"""A/B the migration strategies at bench shape on the real chip:
global payload sort vs mover-extraction vs auto (cond) dispatch."""
import os, time, json
os.environ.setdefault("XPIC_X64", "0")
import jax, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/xpic_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
import jax.numpy as jnp
from functools import partial
from xpic_tpu.config import Geometry
from xpic_tpu.ops import binning as B
from xpic_tpu.particles import ParticleArrays

n = int(os.environ.get("BENCH_GRID", "32"))
K = int(os.environ.get("BENCH_K", "80"))
ppc = 50
geom = Geometry(dx=0.5, dy=0.5, dz=0.5, dt=1.5, nx=n, ny=n, nz=n, nt=1)
rng = np.random.default_rng(0)
N = geom.n_cells * ppc
r = rng.random((N, 3)) * np.array(geom.L)
p = rng.standard_normal((N, 3)) * 0.014
sp = ParticleArrays(r=jnp.asarray(r, jnp.float32), p=jnp.asarray(p, jnp.float32),
                    alive=jnp.ones(N, bool))
st = B.bin_state(sp, geom, K)
st = B._drift_impl(st, geom)  # a drifted state, like mid-step
st = jax.block_until_ready(st)

def fence(out):
    return float(jnp.sum(out[0].r[0, 0]))

def timeit(f, reps=20):
    out = f(st); fence(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(st)
    fence(out)
    return (time.perf_counter() - t0) / reps * 1e3

g = jax.jit(partial(B._rebin_global, geom=geom))
i = jax.jit(partial(B._rebin_incremental, geom=geom))
a = jax.jit(partial(B._rebin_core, geom=geom))

res = {"K": K, "grid": n,
       "mover_frac": float(jnp.mean((B.state_cell_ids(st, geom)
                     != jnp.arange(geom.n_cells)[:, None]) & st.valid))}
res["global_ms"] = timeit(g)
res["incremental_ms"] = timeit(i)
res["auto_ms"] = timeit(a)
_, li = i(st); _, lg = g(st)
res["load_incremental"] = np.asarray(li).tolist()
res["load_global"] = np.asarray(lg).tolist()
print(json.dumps(res))
