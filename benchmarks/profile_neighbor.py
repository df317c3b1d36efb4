"""Neighbor-exchange rebin vs the global payload sort, on chip.

Bench shape 32^3 x 50 ppc, K = 80 — the same state the ECSIM bench
migrates every step.  Run with PYTHONPATH=/root/repo:/root/.axon_site.
"""
import json
import os
import time

os.environ["XPIC_X64"] = "0"  # Mosaic requires 32-bit mode (see binning)

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/xpic_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import jax.numpy as jnp

from xpic_tpu.config import Geometry
from xpic_tpu.ops import binning as B
from xpic_tpu.ops.neighbor_rebin import far_mover_count, rebin_neighbor
from xpic_tpu.particles import ParticleArrays

geom = Geometry(dx=0.5, dy=0.5, dz=0.5, dt=1.5, nx=32, ny=32, nz=32, nt=1)
rng = np.random.default_rng(0)
n = geom.n_cells * 50
sp = ParticleArrays(
    r=jnp.asarray(rng.random((n, 3)) * np.array(geom.L), jnp.float32),
    p=jnp.asarray(rng.standard_normal((n, 3)) * 0.014, jnp.float32),
    alive=jnp.ones(n, bool),
)
st0 = B.bin_state(sp, geom, 80)
st0 = B._drift_impl(st0, geom)  # give the rebins real movers


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


res = {}

g_fn = jax.jit(lambda s: B._rebin_global(s, geom))
res["global_ms"], (sg, lg) = timeit(g_fn, st0)

n_fn = jax.jit(lambda s: rebin_neighbor(s, geom))
res["neighbor_ms"], (sn, ln) = timeit(n_fn, st0)

guard_fn = jax.jit(lambda s: B._rebin_neighbor_guarded(s, geom))
res["neighbor_guarded_ms"], (su, lu) = timeit(guard_fn, st0)

far_fn = jax.jit(lambda s: far_mover_count(s, geom))
res["far_count_ms"], _ = timeit(far_fn, st0)

res["load_global"] = [int(v) for v in np.asarray(lg)]
res["load_neighbor"] = [int(v) for v in np.asarray(ln)]
res["load_guarded"] = [int(v) for v in np.asarray(lu)]
res["valid_match"] = bool(
    int(jnp.sum(sg.valid)) == int(jnp.sum(sn.valid)) == int(jnp.sum(su.valid))
)
res["r_sum_match"] = bool(
    abs(float(jnp.sum(jnp.where(sg.valid[..., None], sg.r, 0.0)))
        - float(jnp.sum(jnp.where(sn.valid[..., None], sn.r, 0.0)))) < 1e-1
)
print(json.dumps(res))
