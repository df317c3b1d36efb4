"""Raw Pallas primitive rates on the chip: pure copy, FMA chains,
lane rolls, lane reductions — calibrates what the rebin kernels can
possibly achieve and which op class is slow."""
import functools
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

G, C, K = 32768, 8, 128
BG = 64
SHAPE = (G, C, K)
spec = pl.BlockSpec((BG, C, K), lambda i: (i, 0, 0),
                    memory_space=pltpu.VMEM)


def call(kernel):
    return jax.jit(lambda x: pl.pallas_call(
        kernel,
        grid=(G // BG,),
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
    )(x))


def k_copy(i_ref, o_ref):
    o_ref[:] = i_ref[:]


def k_fma16(i_ref, o_ref):
    x = i_ref[:]
    acc = x
    for _ in range(16):
        acc = acc * 1.0001 + x
    o_ref[:] = acc


def k_fma64(i_ref, o_ref):
    x = i_ref[:]
    acc = x
    for _ in range(64):
        acc = acc * 1.0001 + x
    o_ref[:] = acc


def k_roll8(i_ref, o_ref):
    x = i_ref[:]
    acc = x
    for s in (1, 2, 4, 8, 16, 32, 64, 1):
        acc = acc + pltpu.roll(x, s, axis=2)
    o_ref[:] = acc


def k_select16(i_ref, o_ref):
    x = i_ref[:]
    m = x[:, 0:1, :]
    acc = x
    for j in range(16):
        acc = jnp.where(m > float(j), acc + x, acc)
    o_ref[:] = acc


def k_reduce16(i_ref, o_ref):
    x = i_ref[:]
    acc = jnp.zeros((BG, C, 1), jnp.float32)
    for j in range(16):
        acc = acc + jnp.sum(x * float(j + 1), axis=2, keepdims=True)
    o_ref[:] = jnp.broadcast_to(acc, x.shape)


def timeit(f, x, reps=10):
    out = f(x)
    _ = float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(x)
    _ = float(jnp.sum(out))
    return (time.perf_counter() - t0) / reps * 1e3


x = jnp.ones(SHAPE, jnp.float32)
res = {}
for name, kern in [("copy", k_copy), ("fma16", k_fma16),
                   ("fma64", k_fma64), ("roll8", k_roll8),
                   ("select16", k_select16), ("reduce16", k_reduce16)]:
    res[name + "_ms"] = timeit(call(kern), x)
n = G * C * K
res["copy_gbps"] = 2 * n * 4 / res["copy_ms"] / 1e6
res["fma64_tops"] = 128 * n / res["fma64_ms"] / 1e9
res["note"] = "dispatch ~1.6ms included in each"
print(json.dumps(res))
