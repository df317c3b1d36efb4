"""Per-piece timing of the neighbor rebin (v3: in-kernel masks,
VPU-unrolled compaction, dense-lane mover buffers)."""
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
A = NR._mover_cols(K)
Kw = K + A

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

res = {"Kw": Kw, "A": A}

@jax.jit
def build_payload(st):
    vf = st.valid.astype(f32)[:, None, :]
    P = jnp.concatenate(
        [jnp.swapaxes(st.r, 1, 2) * vf, jnp.swapaxes(st.p, 1, 2) * vf,
         vf, jnp.zeros((G, 1, K), f32)], axis=1)
    return jnp.concatenate([P, jnp.zeros((G, 8, A), f32)], axis=2)

res["payload_build_ms"], P = timeit(build_payload, st)

extract = jax.jit(lambda P: NR._extract_pass(
    P, axis_ch=0, stride_cells=1, n_ax=geom.nx))
res["extract_ms"], (P2, up, dn) = timeit(extract, P)

@jax.jit
def rolls(up, dn):
    return (NR._roll_cells(up, geom, 2, +1), NR._roll_cells(dn, geom, 2, -1))

res["rolls_ms"], (upr, dnr) = timeit(rolls, up, dn)

place = jax.jit(lambda *a: NR._place_pass(*a))
res["place_ms"], _ = timeit(place, P2, upr, dnr)

res["full_neighbor_ms"], _ = timeit(
    jax.jit(lambda s: NR.rebin_neighbor(s, geom)), st)
res["global_ms"], _ = timeit(
    jax.jit(lambda s: B._rebin_global(s, geom)), st)
print(json.dumps(res))
