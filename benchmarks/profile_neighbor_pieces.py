"""Per-piece timing of the neighbor rebin at the bench shape."""
import json, os, time
os.environ["XPIC_X64"] = "0"
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/xpic_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
import jax.numpy as jnp
import numpy as np
from xpic_tpu.config import Geometry
from xpic_tpu.ops import binning as B
from xpic_tpu.ops import neighbor_rebin as NR
from xpic_tpu.particles import ParticleArrays

geom = Geometry(dx=0.5, dy=0.5, dz=0.5, dt=1.5, nx=32, ny=32, nz=32, nt=1)
rng = np.random.default_rng(0)
n = geom.n_cells * 50
sp = ParticleArrays(
    r=jnp.asarray(rng.random((n, 3)) * np.array(geom.L), jnp.float32),
    p=jnp.asarray(rng.standard_normal((n, 3)) * 0.014, jnp.float32),
    alive=jnp.ones(n, bool),
)
st = B._drift_impl(B.bin_state(sp, geom, 80), geom)
G, K = st.valid.shape
f32 = jnp.float32

def fence(out):
    for leaf in jax.tree_util.tree_leaves(out):
        return float(jnp.sum(leaf))
    return 0.0

def timeit(f, *args, reps=10):
    out = f(*args); fence(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    fence(out)
    return (time.perf_counter() - t0) / reps * 1e3, out

res = {}

@jax.jit
def build_payload(st):
    pad = max(8, (K // 8 + 7) // 8 * 8)
    P = jnp.concatenate(
        [jnp.swapaxes(st.r, 1, 2), jnp.swapaxes(st.p, 1, 2),
         st.valid.astype(f32)[:, None, :],
         jnp.zeros((G, 1, K), f32)], axis=1)
    return jnp.concatenate([P, jnp.zeros((G, 8, pad), f32)], axis=2)

res["payload_build_ms"], P = timeit(build_payload, st)
Kw = P.shape[2]

@jax.jit
def masks_and_rolls(P):
    stay, plus, minus = NR._axis_masks(P, geom, 0)
    up = NR._roll_cells(P, geom, 2, +1)
    dn = NR._roll_cells(P, geom, 2, -1)
    m_up = NR._roll_cells(plus, geom, 2, +1)
    m_dn = NR._roll_cells(minus, geom, 2, -1)
    return up, dn, stay, m_up, m_dn

res["masks_rolls_ms"], (up, dn, stay, m_up, m_dn) = timeit(masks_and_rolls, P)

merge = jax.jit(lambda *a: NR._merge_pass(*a))
res["merge_pass_ms"], _ = timeit(merge, P, up, dn, stay, m_up, m_dn)

res["far_ms"], _ = timeit(jax.jit(lambda s: NR.far_mover_count(s, geom)), st)
res["full_neighbor_ms"], _ = timeit(jax.jit(lambda s: NR.rebin_neighbor(s, geom)), st)
res["Kw"] = Kw
print(json.dumps(res))
