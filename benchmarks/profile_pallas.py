"""Time the pallas fill and gather kernels in isolation on chip."""
import os, time, json
import jax, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/xpic_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
import jax.numpy as jnp
from xpic_tpu.config import Geometry
from xpic_tpu.ops.pallas_ecsim import ecsim_fill_pallas, ecsim_gather_pallas
from xpic_tpu.ops.ecsim_blocks import gather_slots, deposit_slot_sums

G, K = 32768, 80
n = 32
geom = Geometry(dx=0.5, dy=0.5, dz=0.5, dt=1.5, nx=n, ny=n, nz=n, nt=1)
rng = np.random.default_rng(0)
t = jnp.asarray(rng.random((G, K, 3)), jnp.float32)
v = jnp.asarray(rng.standard_normal((G, K, 3)) * 0.014, jnp.float32)
B_p = jnp.asarray(rng.standard_normal((G, K, 3)) * 0.01, jnp.float32)
valid = jnp.ones((G, K), bool)
F = jnp.asarray(rng.standard_normal((3, n, n, n)), jnp.float32)

def _fence(out):
    for leaf in jax.tree_util.tree_leaves(out):
        return float(jnp.sum(leaf))

def timeit(f, *args, reps=10, **kw):
    out = f(*args, **kw); _fence(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args, **kw)
    _fence(out)
    return (time.perf_counter() - t0) / reps, out

res = {}
for bg in (64, 128):
    tt, (L, Islot) = timeit(ecsim_fill_pallas, t, v, B_p, valid,
                            q=-1.0, m=1.0, mpw=0.02, dt=1.5, block_g=bg)
    res[f"fill_pallas_bg{bg}_ms"] = tt*1e3

tt, _ = timeit(deposit_slot_sums, Islot, geom); res["deposit_sums_ms"] = tt*1e3
Fg = gather_slots(F, geom)
for bg in (128, 256):
    tt, _ = timeit(ecsim_gather_pallas, t, Fg, block_g=bg)
    res[f"gather_pallas_bg{bg}_ms"] = tt*1e3
print(json.dumps(res))
