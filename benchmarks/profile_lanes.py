"""K-last (lane-friendly) layout for the ECSIM fill, measured on chip."""
import os, time, json
import jax, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/xpic_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
import jax.numpy as jnp
from xpic_tpu.ops.splines import spline

G, K = 32768, 80
rng = np.random.default_rng(0)
t = jnp.asarray(rng.random((G, K, 3)), jnp.float32)      # current layout
tT = jnp.asarray(np.transpose(np.asarray(t), (0, 2, 1))) # [G,3,K]
v = jnp.asarray(rng.standard_normal((G, K, 3)) * 0.014, jnp.float32)
B_p = jnp.asarray(rng.standard_normal((G, K, 3)) * 0.01, jnp.float32)
valid = jnp.ones((G, K), bool)

def _fence(out):
    for leaf in jax.tree_util.tree_leaves(out):
        return float(jnp.sum(leaf))

def timeit(f, *args, reps=10):
    out = f(*args); _fence(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    _fence(out)
    return (time.perf_counter() - t0) / reps, out

def axis_w(ta, order, width, anchor, stag):
    # ta: [G, K]; returns [G, width, K] (K stays in lanes)
    sf = spline(order)
    offs = np.arange(width) + (anchor + (0.5 if stag else 0.0))
    return jnp.stack([sf(ta - o) for o in offs], axis=1)

@jax.jit
def weights_lanes(tT):
    # W[G, 3, 12, K]
    wn = [axis_w(tT[:, a], 1, 2, 0, False) for a in range(3)]  # [G,2,K]
    ws = [axis_w(tT[:, a], 1, 3, -1, True) for a in range(3)]  # [G,3,K]
    wnx, wny, wnz = wn
    wsx, wsy, wsz = ws
    WX = (wnz[:, :, None, None] * wny[:, None, :, None] *
          wsx[:, None, None, :, :][:, 0]).reshape(G, 12, K)
    return WX

@jax.jit
def weights_lanes_full(tT):
    wn = [axis_w(tT[:, a], 1, 2, 0, False) for a in range(3)]
    ws = [axis_w(tT[:, a], 1, 3, -1, True) for a in range(3)]
    wnx, wny, wnz = wn
    wsx, wsy, wsz = ws
    def comb(a, b, c):  # a:[G,na,K] b:[G,nb,K] c:[G,nc,K] -> [G,na*nb*nc,K]
        out = a[:, :, None, None, :] * b[:, None, :, None, :] * c[:, None, None, :, :]
        return out.reshape(G, -1, K)
    WX = comb(wnz, wny, wsx)
    WY = comb(wnz, wsy, wnx)
    WZ = comb(wsz, wny, wnx)
    return jnp.stack([WX, WY, WZ], axis=1)  # [G,3,12,K]

@jax.jit
def assemble_lanes(W, M):
    # W: [G,3,12,K], M: [G,3,3,K] -> L [G,3,12,3,12]
    # 2-operand form per c (the 3-operand einsum breaks the TPU compile)
    outs = []
    for c in range(3):
        T_c = W[:, c, None, :, :] * M[:, c, :, None, :]  # [G,3,12,K]
        L_c = jnp.einsum("gdik,gdjk->gidj", T_c, W,
                         preferred_element_type=W.dtype)
        outs.append(L_c)
    return jnp.stack(outs, axis=1)  # [G,3,12,3,12]

res = {}
tt, W = timeit(weights_lanes_full, tT); res["weights_lanes_ms"] = tt*1e3
M = jnp.asarray(rng.standard_normal((G, 3, 3, K)), jnp.float32)
tt, L = timeit(assemble_lanes, W, M); res["assemble_lanes_ms"] = tt*1e3

@jax.jit
def transpose_in(t):
    return jnp.transpose(t, (0, 2, 1))

tt, _ = timeit(transpose_in, t); res["transpose_ms"] = tt*1e3

@jax.jit
def deposit_lanes(I_p, W):
    # I_p [G,3,K]; Islot[g,c,s] = sum_k I_p[g,c,k] W[g,c,s,k]
    return jnp.einsum("gck,gcsk->gcs", I_p, W,
                      preferred_element_type=W.dtype)

I_p = jnp.asarray(rng.standard_normal((G, 3, K)), jnp.float32)
tt, _ = timeit(deposit_lanes, I_p, W); res["deposit_lanes_ms"] = tt*1e3
print(json.dumps(res))
