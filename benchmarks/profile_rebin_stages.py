"""Stage-by-stage timing of the mover-extraction rebin on the real chip."""
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

n, K, ppc = 32, 80, 50
geom = Geometry(dx=0.5, dy=0.5, dz=0.5, dt=1.5, nx=n, ny=n, nz=n, nt=1)
rng = np.random.default_rng(0)
N = geom.n_cells * ppc
sp = ParticleArrays(
    r=jnp.asarray(rng.random((N, 3)) * np.array(geom.L), jnp.float32),
    p=jnp.asarray(rng.standard_normal((N, 3)) * 0.014, jnp.float32),
    alive=jnp.ones(N, bool))
st = jax.block_until_ready(B._drift_impl(B.bin_state(sp, geom, K), geom))
G = geom.n_cells
NK = G * K
M = B._mover_cap(NK)

def timeit(f, *args, reps=20):
    out = jax.block_until_ready(f(*args))
    # axon: block_until_ready may not fence; read a scalar
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / reps * 1e3, out

@partial(jax.jit, static_argnames=())
def stage_rowsort(st):
    ids = B.state_cell_ids(st, geom)
    home = jnp.arange(G, dtype=jnp.int32)[:, None]
    stay = st.valid & (ids == home)
    move = st.valid & ~stay & (ids < G)
    key = jnp.where(stay, 0, jnp.where(move, 1, 2)).astype(jnp.int32)
    k_col = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None, :], (G, K))
    out = jax.lax.sort(
        (key, k_col, st.r[..., 0], st.r[..., 1], st.r[..., 2],
         st.p[..., 0], st.p[..., 1], st.p[..., 2]), num_keys=2, dimension=1)
    return out

@jax.jit
def stage_counts(out):
    key_s = out[0]
    s = jnp.sum(key_s == 0, axis=1).astype(jnp.int32)
    m = jnp.sum(key_s == 1, axis=1).astype(jnp.int32)
    moff = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(m).astype(jnp.int32)])
    return s, m, moff

@jax.jit
def stage_extract(out, s, moff):
    r_s = jnp.stack(out[2:5], axis=-1)
    p_s = jnp.stack(out[5:8], axis=-1)
    i = jnp.arange(M, dtype=jnp.int32)
    src_g = jnp.clip(jnp.searchsorted(moff, i, side="right").astype(jnp.int32) - 1, 0, G - 1)
    src_k = s[src_g] + (i - moff[src_g])
    packed = jnp.concatenate([r_s, p_s], axis=-1).reshape(NK, 6)
    buf = packed[jnp.clip(src_g * K + src_k, 0, NK - 1)]
    return buf

@jax.jit
def stage_searchsorted_only(moff):
    i = jnp.arange(M, dtype=jnp.int32)
    return jnp.searchsorted(moff, i, side="right").astype(jnp.int32)

@jax.jit
def stage_bufsort(buf, moff):
    total_m = moff[-1]
    i = jnp.arange(M, dtype=jnp.int32)
    n3 = jnp.asarray([geom.nx, geom.ny, geom.nz], jnp.int32)
    c = jnp.clip(jnp.floor(buf[:, :3]).astype(jnp.int32), 0, n3 - 1)
    dest = (c[:, 2] * geom.ny + c[:, 1]) * geom.nx + c[:, 0]
    dest = jnp.where(i < total_m, dest, G).astype(jnp.int32)
    bout = jax.lax.sort((dest, i, buf[:, 0], buf[:, 1], buf[:, 2],
                         buf[:, 3], buf[:, 4], buf[:, 5]), num_keys=2)
    return bout

@jax.jit
def stage_merge(bout, s, out):
    A = min(K, B._A_MAX)
    dest_s = bout[0]
    buf_s = jnp.stack(bout[2:], axis=-1)
    aoff = jnp.searchsorted(dest_s, jnp.arange(G + 1, dtype=jnp.int32)).astype(jnp.int32)
    a = aoff[1:] - aoff[:G]
    qs = jnp.arange(A, dtype=jnp.int32)[None, :]
    okq = (qs < a[:, None]) & ((K - 1 - qs) >= s[:, None])
    blk = buf_s[jnp.clip((aoff[:G, None] + qs).reshape(-1), 0, M - 1)]
    blk = blk.reshape(G, A, 6)[:, ::-1, :]
    okq_r = okq[:, ::-1]
    r_s = jnp.stack(out[2:5], axis=-1)
    p_s = jnp.stack(out[5:8], axis=-1)
    k_col = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None, :], (G, K))
    center = B._cell_centers(geom, st.r.dtype)
    valid_stay = k_col < s[:, None]
    r_new = jnp.where(valid_stay[..., None], r_s, center)
    p_new = jnp.where(valid_stay[..., None], p_s, 0.0)
    r_new = jnp.concatenate(
        [r_new[:, : K - A], jnp.where(okq_r[..., None], blk[..., :3], r_new[:, K - A:])], axis=1)
    p_new = jnp.concatenate(
        [p_new[:, : K - A], jnp.where(okq_r[..., None], blk[..., 3:], p_new[:, K - A:])], axis=1)
    return r_new, p_new

res = {"M": M}
t, out = timeit(stage_rowsort, st); res["rowsort_ms"] = t
t, (s, m, moff) = timeit(stage_counts, out); res["counts_ms"] = t
t, _ = timeit(stage_searchsorted_only, moff); res["searchsorted_ms"] = t
t, buf = timeit(stage_extract, out, s, moff); res["extract_ms"] = t
t, bout = timeit(stage_bufsort, buf, moff); res["bufsort_ms"] = t
t, _ = timeit(stage_merge, bout, s, out); res["merge_ms"] = t
print(json.dumps(res))
