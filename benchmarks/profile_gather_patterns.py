"""Which gather/searchsorted formulations are fast on this chip?"""
import os, time, json
os.environ.setdefault("XPIC_X64", "0")
import jax, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/xpic_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
import jax.numpy as jnp

G, K = 32768, 80
NK = G * K
M = 327680
rng = np.random.default_rng(0)
payload = jnp.asarray(rng.standard_normal((NK, 6)), jnp.float32)
# near-sorted segment starts like rebin's seg
counts = rng.poisson(50, G).astype(np.int32)
seg = np.zeros(G + 1, np.int32); seg[1:] = np.cumsum(counts)
seg = jnp.asarray(np.minimum(seg, NK))
idx_1d_sortedish = jnp.asarray(np.sort(rng.integers(0, NK, M)).astype(np.int32))
idx_1d_random = jnp.asarray(rng.integers(0, NK, M).astype(np.int32))
idx_small = jnp.asarray(np.sort(rng.integers(0, M, G * 16)).astype(np.int32))
moff = jnp.asarray(np.concatenate([[0], np.cumsum(rng.poisson(10, G))]).astype(np.int32))

def timeit(f, *args, reps=20):
    out = f(*args)
    _ = np.asarray(out).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    _ = np.asarray(out).ravel()[:1]
    return (time.perf_counter() - t0) / reps * 1e3

@jax.jit
def g_padded(payload, seg):  # rebin_global's pattern: [G,K] indices
    k = jnp.arange(K, dtype=jnp.int32)[None, :]
    pos = jnp.minimum(seg[:G, None] + k, NK - 1)
    return payload[pos]

@jax.jit
def g_1d_sorted(payload, idx):
    return payload[idx]

@jax.jit
def g_1d_random(payload, idx):
    return payload[idx]

@jax.jit
def g_take_axis0(payload, idx):
    return jnp.take(payload, idx, axis=0)

@jax.jit
def g_2d_shaped(payload, idx):  # same rows, but indices shaped [G,16]
    return payload[idx.reshape(G, 16)]

@jax.jit
def ss_right(moff):
    i = jnp.arange(M, dtype=jnp.int32)
    return jnp.searchsorted(moff, i, side="right")

@jax.jit
def ss_via_scatter_cummax(moff):
    # segment ids via scatter + cummax: src_g[i] = max g with moff[g] <= i
    z = jnp.zeros(M, jnp.int32)
    g = jnp.arange(G + 1, dtype=jnp.int32)
    pos = jnp.clip(moff, 0, M - 1)
    z = z.at[pos].max(g)
    return jax.lax.cummax(z)

@jax.jit
def ss_via_sortsearch(moff):
    # co-sort trick: sort (concat(moff, i)) and derive ranks
    i = jnp.arange(M, dtype=jnp.int32)
    keys = jnp.concatenate([moff * 2 + 1, i * 2])  # boundaries win ties
    order = jnp.argsort(keys)
    flags = jnp.where(order < (G + 1), 1, 0)
    segid = jnp.cumsum(flags)
    # positions of the i-entries in sorted order -> invert
    inv = jnp.zeros(M + G + 1, jnp.int32).at[order].set(jnp.arange(M + G + 1, dtype=jnp.int32))
    return segid[inv[G + 1:]] - 1

res = {}
res["padded_GK_ms"] = timeit(g_padded, payload, seg)
res["gather1d_sorted_ms"] = timeit(g_1d_sorted, payload, idx_1d_sortedish)
res["gather1d_random_ms"] = timeit(g_1d_random, payload, idx_1d_random)
res["take_axis0_ms"] = timeit(g_take_axis0, payload, idx_1d_sortedish)
res["gather2d_G16_ms"] = timeit(g_2d_shaped, payload, idx_small % NK)
res["searchsorted_ms"] = timeit(ss_right, moff)
res["scatter_cummax_ms"] = timeit(ss_via_scatter_cummax, moff)
print(json.dumps(res))
