"""Stage timing of the sort+buffer neighbor rebin at the bench shape.
Each isolated stage carries ~1.6 ms of dispatch (profile_roofcal.py);
the full fused numbers at the end are the real ones."""
import json
import os
import sys
import time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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

K = int(os.environ.get("SLOTS", "80"))
geom = Geometry(dx=0.5, dy=0.5, dz=0.5, dt=1.5, nx=32, ny=32, nz=32, nt=1)
rng = np.random.default_rng(0)
n = geom.n_cells * 50
sp = ParticleArrays(
    r=jnp.asarray(rng.random((n, 3)) * np.array(geom.L), jnp.float32),
    p=jnp.asarray(rng.standard_normal((n, 3)) * 0.014, jnp.float32),
    alive=jnp.ones(n, bool),
)
st = B._drift_impl(B.bin_state(sp, geom, K), geom)
G, K = st.valid.shape
AT = NR._buffer_cols(K)


def fence(out):
    for leaf in jax.tree_util.tree_leaves(out):
        return float(jnp.sum(leaf))
    return 0.0


def timeit(f, *args, reps=10):
    out = f(*args)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    fence(out)
    return (time.perf_counter() - t0) / reps * 1e3, out


res = {"K": K, "AT": AT}


@jax.jit
def stats(st):
    ids = B.state_cell_ids(st, geom)
    home = jnp.arange(G, dtype=jnp.int32)[:, None]
    moved = jnp.sum(st.valid & (ids != home)).astype(jnp.int32)
    return moved, jnp.sum(st.valid).astype(jnp.int32)


res["stats_ms"], _ = timeit(stats, st)
res["far_ms"], _ = timeit(
    jax.jit(lambda s: NR.far_mover_count(s, geom)), st)


@jax.jit
def psort(st):
    ids = B.state_cell_ids(st, geom)
    home = jnp.arange(G, dtype=jnp.int32)[:, None]
    mover = st.valid & (ids != home)
    key = jnp.where(mover, 2, jnp.where(st.valid, 0, 1)).astype(jnp.int32)
    kcol = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None, :], (G, K))
    return jax.lax.sort(
        (key, kcol,
         st.r[..., 0], st.r[..., 1], st.r[..., 2],
         st.p[..., 0], st.p[..., 1], st.p[..., 2]),
        num_keys=2, dimension=1)


res["partition_sort_ms"], out = timeit(psort, st)
key_s = out[0]
planes = out[2:8]

PACK = NR._pack_factor(geom.nx, AT)
GP, L = G // PACK, PACK * AT
res["pack"] = PACK


@jax.jit
def mkbuf(key_s, *planes):
    bufv = (key_s[:, K - AT:] == 2).astype(jnp.float32)
    return jnp.stack(
        [(p[:, K - AT:] * bufv).reshape(GP, L) for p in planes]
        + [bufv.reshape(GP, L), jnp.zeros((GP, L), jnp.float32)], axis=1)


res["mkbuf_ms"], buf = timeit(mkbuf, key_s, *planes)

home0 = NR._home_coord_packed(geom, 0, PACK)[:, None]
ext = jax.jit(lambda b, h: NR._extract_pass(
    b, h, axis_ch=0, n_ax=geom.nx, seg=AT, pack=PACK))
res["buf_extract_ms"], (b2, up, dn) = timeit(ext, buf, home0)
res["buf_rolls_ms"], (upr, dnr) = timeit(
    jax.jit(lambda u, d: (NR._roll_cells(u, geom, 2, 1, PACK),
                          NR._roll_cells(d, geom, 2, -1, PACK))), up, dn)
res["buf_place_ms"], _ = timeit(
    jax.jit(lambda *a: NR._place_pass(*a, seg=AT, pack=PACK)),
    b2, upr, dnr)


@jax.jit
def tailmerge(key_s, buf, *planes):
    stay = key_s == 0
    n_stay = jnp.sum(stay, axis=1).astype(jnp.int32)
    arr_ok = buf[:, 6, :].reshape(G, AT) > 0.5
    arr = tuple(buf[:, c, :].reshape(G, AT) for c in range(6))
    qs = jnp.arange(AT, dtype=jnp.int32)[None, :]
    ok = arr_ok & ((K - 1 - qs) >= n_stay[:, None])
    okr = ok[:, ::-1]
    center = B._cell_centers(geom, jnp.float32)
    r_stay = jnp.stack(planes[0:3], axis=-1)
    r_stay = jnp.where(stay[..., None], r_stay, center)
    arr_r = jnp.stack(arr[0:3], axis=-1)[:, ::-1, :]
    return jnp.concatenate(
        [r_stay[:, : K - AT],
         jnp.where(okr[..., None], arr_r, r_stay[:, K - AT:])], axis=1)


res["tailmerge_ms"], _ = timeit(tailmerge, key_s, buf, *planes)

res["full_neighbor_ms"], _ = timeit(
    jax.jit(lambda s: NR.rebin_neighbor(s, geom)), st)
res["guarded_ms"], _ = timeit(
    jax.jit(lambda s: B._rebin_neighbor_guarded(s, geom)), st)
res["global_ms"], _ = timeit(
    jax.jit(lambda s: B._rebin_global(s, geom)), st)
print(json.dumps(res))
