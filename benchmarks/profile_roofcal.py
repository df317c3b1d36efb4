"""Calibrate the chip: dispatch overhead, streaming HBM bandwidth, and
f32 matmul peak, with the same readback-fence timing the other
profilers use.  Separates "our kernels are inefficient" from "the
backend costs X per dispatch / the roof is lower than the spec"."""
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


def timeit(f, *args, reps=20):
    out = f(*args)
    jax.block_until_ready(out)
    _ = float(jnp.sum(out if isinstance(out, jax.Array) else out[0]))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    _ = float(jnp.sum(out if isinstance(out, jax.Array) else out[0]))
    return (time.perf_counter() - t0) / reps * 1e3


res = {}

# dispatch floor: trivial op on a tiny array
tiny = jnp.zeros((8, 128), jnp.float32)
f_tiny = jax.jit(lambda x: x + 1.0)
res["dispatch_ms"] = timeit(f_tiny, tiny)

# streaming: y = x + 1 over 256 MB (read + write = 512 MB)
big = jnp.zeros((512, 1024, 128), jnp.float32)  # 256 MB
f_copy = jax.jit(lambda x: x + 1.0)
ms = timeit(f_copy, big, reps=10)
res["stream_ms"] = ms
res["stream_gbps"] = 2 * big.size * 4 / ms / 1e6

# reduction: sum over 256 MB (read only)
f_sum = jax.jit(lambda x: jnp.sum(x, axis=(1, 2)))
ms = timeit(f_sum, big, reps=10)
res["reduce_ms"] = ms
res["reduce_gbps"] = big.size * 4 / ms / 1e6

# transpose-like relayout: swap last two axes of [G, 8, K]
P = jnp.zeros((32768, 8, 96), jnp.float32)
f_tr = jax.jit(lambda x: jnp.swapaxes(x, 1, 2) + 0.0)
ms = timeit(f_tr, P, reps=10)
res["swap_ms"] = ms
res["swap_gbps"] = 2 * P.size * 4 / ms / 1e6

# roll along a middle axis, the halo-exchange primitive
V = jnp.zeros((32, 32, 32, 128), jnp.float32)
f_roll = jax.jit(lambda x: jnp.roll(x, 1, axis=0) + jnp.roll(x, -1, axis=1))
ms = timeit(f_roll, V, reps=10)
res["roll_ms"] = ms
res["roll_gbps"] = 4 * V.size * 4 / ms / 1e6

# f32 matmul peak: 4096^3
a = jnp.zeros((4096, 4096), jnp.float32)
f_mm = jax.jit(lambda x: x @ x)
ms = timeit(f_mm, a, reps=10)
res["matmul_ms"] = ms
res["matmul_tflops"] = 2 * 4096**3 / ms / 1e9

# batched small matmul, the assemble shape: [G,12,K]x[G,K,36]
G, K = 32768, 80
w = jnp.zeros((G, 12, K), jnp.float32)
t2 = jnp.zeros((G, K, 36), jnp.float32)
f_bmm = jax.jit(lambda w, t: jnp.einsum(
    "gik,gkm->gim", w, t, preferred_element_type=jnp.float32))
ms = timeit(f_bmm, w, t2, reps=10)
res["bmm_ms"] = ms
res["bmm_tflops"] = 2 * G * 12 * K * 36 / ms / 1e9

# lane reduction over K for [G*12, K]
x = jnp.zeros((G * 12, K), jnp.float32)
f_lr = jax.jit(lambda x: jnp.sum(x * x, axis=-1))
ms = timeit(f_lr, x, reps=10)
res["lanered_ms"] = ms
res["lanered_gbps"] = x.size * 4 / ms / 1e6

print(json.dumps(res))
