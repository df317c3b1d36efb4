"""Time fill_phase XLA vs Pallas routes, embedded (summed outputs)."""
import os, time, json
import jax, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/xpic_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
import jax.numpy as jnp
from functools import partial
from xpic_tpu.config import Geometry
from xpic_tpu.ops.binning import bin_state
from xpic_tpu.ops.gather_scatter import cell_t
from xpic_tpu.parallel import step
from xpic_tpu.particles import ParticleArrays

n, ppc, K = 32, 50, 80
geom = Geometry(dx=0.5, dy=0.5, dz=0.5, dt=1.5, nx=n, ny=n, nz=n, nt=1)
rng = np.random.default_rng(0)
N = geom.n_cells * ppc
sp = ParticleArrays(
    r=jnp.asarray(rng.random((N,3)) * np.array(geom.L), jnp.float32),
    p=jnp.asarray(rng.standard_normal((N,3)) * 0.014, jnp.float32),
    alive=jnp.ones(N, bool))
st = bin_state(sp, geom, K)
B = jnp.asarray(rng.standard_normal((3,n,n,n))*0.01, jnp.float32)

def timeit(f, *args, reps=10):
    out = f(*args); float(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    float(out)
    return (time.perf_counter() - t0) / reps

def make_wrapper():
    @partial(jax.jit, static_argnames=("geom",))
    def w(B, st, geom):
        t = cell_t(geom, st.r)
        currI, L, W, B_p = step.fill_phase(B, st, t, geom, q=-1.0, m=1.0,
                                           mpw=1.0/ppc)
        return jnp.sum(currI) + jnp.sum(L)
    return w

res = {}
step._FORCE_PALLAS = False
wx = make_wrapper()
res["fill_xla_ms"] = timeit(wx, B, st, geom) * 1e3
step._FORCE_PALLAS = True
wp = make_wrapper()
# different jit object -> fresh trace with pallas route
res["fill_pallas_ms"] = timeit(wp, B, st, geom) * 1e3
print(json.dumps(res))
