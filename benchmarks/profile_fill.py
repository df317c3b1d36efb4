"""A/B rebin variants + fill sub-phase breakdown on the real chip."""
import os, time, json
os.environ.setdefault("XPIC_X64", "0")
import jax, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/xpic_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
import jax.numpy as jnp
from functools import partial
from xpic_tpu.config import Geometry
from xpic_tpu.ops.binning import BinnedState, bin_state, _drift_impl, _rebin_core, state_cell_ids, _cell_centers
from xpic_tpu.ops.gather_scatter import B_STAGGER, cell_t, gather_vector
from xpic_tpu.ops.ecsim_blocks import (assemble_blocks, deposit_slots,
                                       ecsim_particle_terms, s1_slot_weights)
from xpic_tpu.particles import ParticleArrays

n = 32; ppc = 50
geom = Geometry(dx=0.5, dy=0.5, dz=0.5, dt=1.5, nx=n, ny=n, nz=n, nt=1)
rng = np.random.default_rng(0)
N = geom.n_cells * ppc
r = rng.random((N,3)) * np.array(geom.L)
p = rng.standard_normal((N,3)) * 0.014
sp = ParticleArrays(r=jnp.asarray(r, jnp.float32), p=jnp.asarray(p, jnp.float32), alive=jnp.ones(N, bool))
K = int(os.environ.get("BENCH_K", "80"))
st = bin_state(sp, geom, K)
B = jnp.zeros((3, n, n, n), jnp.float32)
q, m, mpw = -1.0, 1.0, 1.0/ppc

def _fence(out):
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

@partial(jax.jit, static_argnames=("geom",))
def rebin_payload(st, geom):
    return _rebin_core(_drift_impl(st, geom), geom)[0]

@partial(jax.jit, static_argnames=("geom",))
def rebin_keysonly(st, geom):
    st = _drift_impl(st, geom)
    G, K = st.valid.shape
    NK = G * K
    ids = state_cell_ids(st, geom).reshape(NK)
    tie = jnp.arange(NK, dtype=jnp.int32)
    s_ids, perm = jax.lax.sort((ids, tie), num_keys=1)
    seg = jnp.searchsorted(s_ids, jnp.arange(G + 1, dtype=jnp.int32)).astype(jnp.int32)
    k = jnp.arange(K, dtype=jnp.int32)[None, :]
    pos = seg[:G, None] + k
    valid = pos < seg[1:, None]
    src = perm[jnp.minimum(pos, NK - 1)]
    rp = jnp.concatenate([st.r, st.p], axis=-1).reshape(NK, 6)[src]
    rr, pp = rp[..., :3], rp[..., 3:]
    center = _cell_centers(geom, st.r.dtype)
    rr = jnp.where(valid[..., None], rr, center)
    pp = jnp.where(valid[..., None], pp, 0.0)
    return BinnedState(r=rr, p=pp, valid=valid)

@partial(jax.jit, static_argnames=("geom",))
def f_bgather(B, st, geom):
    t = cell_t(geom, st.r)
    return gather_vector(B, t, st.valid, geom, order=1, width=3, anchor=-1, stagger=B_STAGGER), t

@jax.jit
def f_weights(t):
    return s1_slot_weights(t)

@jax.jit
def f_terms(B_p, st_p, valid):
    return ecsim_particle_terms(B_p, st_p, valid, q=q, m=m, mpw=mpw, dt=geom.dt)

@partial(jax.jit, static_argnames=("geom",))
def f_deposit(I_p, W, geom):
    return deposit_slots(I_p, W, geom)

@jax.jit
def f_assemble(W, M):
    return assemble_blocks(W, M)

res = {}
t1, st2 = timeit(rebin_payload, st, geom); res["rebin_payload_ms"] = t1*1e3
t2, st3 = timeit(rebin_keysonly, st, geom); res["rebin_keysonly_ms"] = t2*1e3
tg, (B_p, t) = timeit(f_bgather, B, st2, geom); res["bgather_ms"] = tg*1e3
tw, W = timeit(f_weights, t); res["weights_ms"] = tw*1e3
tt, (I_p, M) = timeit(f_terms, B_p, st2.p, st2.valid); res["terms_ms"] = tt*1e3
td, currI = timeit(f_deposit, I_p, W, geom); res["deposit_ms"] = td*1e3
ta, L = timeit(f_assemble, W, M); res["assemble_ms"] = ta*1e3
res["K"] = K
print(json.dumps(res))
