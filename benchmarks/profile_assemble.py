"""Race assemble_blocks formulations on the real chip."""
import os, time, json
import jax, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/xpic_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
import jax.numpy as jnp

G, K = 32768, 80
rng = np.random.default_rng(0)
W = jnp.asarray(rng.standard_normal((G, K, 3, 12)), jnp.float32)
M = jnp.asarray(rng.standard_normal((G, K, 3, 3)), jnp.float32)

def _fence(out):
    return float(jnp.sum(out))

def timeit(f, *args, reps=10):
    out = f(*args); _fence(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    _fence(out)
    return (time.perf_counter() - t0) / reps, out

@jax.jit
def a_current(W, M):
    return jnp.einsum("gkci,gkcd,gkdj->gcidj", W, M, W,
                      preferred_element_type=W.dtype)

@jax.jit
def a_threepass(W, M):
    # per c: T = M[:,:,c,:,None]*W -> [G,K,3,12]; L_c = W_c^T @ T
    outs = []
    for c in range(3):
        T = (M[:, :, c, :, None] * W).reshape(G, K, 36)
        L_c = jnp.einsum("gki,gkm->gim", W[:, :, c], T,
                         preferred_element_type=W.dtype)
        outs.append(L_c.reshape(G, 12, 3, 12))
    return jnp.stack(outs, axis=1)  # [G,3,12,3,12]

@jax.jit
def a_onebig(W, M):
    # V[g,k,(c,i),d] = W[g,k,c,i] * M[g,k,c,d]; L = einsum over k with W_d
    V = (W[:, :, :, :, None] * M[:, :, :, None, :]).reshape(G, K, 36, 3)
    L = jnp.einsum("gkmd,gkdj->gmdj", V, W,
                   preferred_element_type=W.dtype)
    return L.reshape(G, 3, 12, 3, 12)

@jax.jit
def a_perdpair(W, M):
    # 9 batched [12,K]x[K,12] matmuls
    blocks = []
    for c in range(3):
        row = []
        for d in range(3):
            A = W[:, :, c, :] * M[:, :, c, d, None]  # [G,K,12]
            row.append(jnp.einsum("gki,gkj->gij", A, W[:, :, d, :],
                                  preferred_element_type=W.dtype))
        blocks.append(jnp.stack(row, axis=2))  # [G,12,3,12]
    return jnp.stack(blocks, axis=1)

res = {}
t, L0 = timeit(a_current, W, M); res["current_ms"] = t*1e3
t, L1 = timeit(a_threepass, W, M); res["threepass_ms"] = t*1e3
t, L2 = timeit(a_onebig, W, M); res["onebig_ms"] = t*1e3
t, L3 = timeit(a_perdpair, W, M); res["perdpair_ms"] = t*1e3
for name, L in (("threepass", L1), ("onebig", L2), ("perdpair", L3)):
    err = float(jnp.max(jnp.abs(L - L0)))
    res[name + "_err"] = err
print(json.dumps(res))
