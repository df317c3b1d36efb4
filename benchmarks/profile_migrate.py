"""Micro-bench: within-row sort/gather costs for a 3-axis migration."""
import os, time, json
import jax, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/xpic_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
import jax.numpy as jnp

G, K = 32768, 80
rng = np.random.default_rng(0)
cls = jnp.asarray(rng.integers(0, 3, (G, K)), jnp.int32)
payload = jnp.asarray(rng.standard_normal((G, K, 6)), jnp.float32)

def _fence(out):
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            return float(jnp.sum(leaf))
    return float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))

def timeit(f, *args, reps=10):
    out = f(*args); _fence(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    _fence(out)
    return (time.perf_counter() - t0) / reps, out

@jax.jit
def rowsort_perm(cls):
    # stable partition permutation per row: sort (cls, k) pairs along K
    k = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None, :], cls.shape)
    _, perm = jax.lax.sort((cls, k), dimension=1, num_keys=1)
    return perm

@jax.jit
def row_take(payload, perm):
    return jnp.take_along_axis(payload, perm[..., None], axis=1)

@jax.jit
def rowsort_payload(cls, payload):
    # payload rides the per-row sort (8 operands, sort along K)
    k = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None, :], cls.shape)
    ops = (cls, k) + tuple(payload[..., i] for i in range(6))
    out = jax.lax.sort(ops, dimension=1, num_keys=2)
    return jnp.stack(out[2:], axis=-1)

@jax.jit
def concat3_take(payload, perm):
    # destination compose: gather rows from [G, 3K] with per-row indices
    big = jnp.concatenate(
        [payload, jnp.roll(payload, 1, axis=0), jnp.roll(payload, -1, axis=0)],
        axis=1,
    )
    idx = (perm * 3) % (3 * K)  # arbitrary in-range index pattern
    return jnp.take_along_axis(big, idx[..., None], axis=1)

res = {}
t, perm = timeit(rowsort_perm, cls); res["rowsort_perm_ms"] = t*1e3
t, _ = timeit(row_take, payload, perm); res["row_take_ms"] = t*1e3
t, _ = timeit(rowsort_payload, cls, payload); res["rowsort_payload_ms"] = t*1e3
t, _ = timeit(concat3_take, payload, perm); res["concat3_take_ms"] = t*1e3
print(json.dumps(res))
