"""Audit the GSPMD partitioning of the fused ECSIM step on an 8-device
mesh: count collectives in the optimized HLO and flag any whose output
is as large as an unsharded big tensor (L blocks, particle payload) —
those would mean the decomposition replicates instead of scaling.

Run on CPU: XLA_FLAGS=--xla_force_host_platform_device_count=8
            JAX_PLATFORMS=cpu python benchmarks/audit_sharded_hlo.py
"""
import os, re, json, collections
os.environ.setdefault("XPIC_X64", "0")
import jax, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/xpic_jax_cache")
import jax.numpy as jnp
from xpic_tpu.config import Geometry
from xpic_tpu.parallel import mesh as pm
from xpic_tpu.parallel.step import ecsim_step_binned
from xpic_tpu.ops.binning import bin_state
from xpic_tpu.particles import ParticleArrays, sort_by_cell

geom = Geometry(dx=0.5, dy=0.5, dz=0.5, dt=1.5, nx=16, ny=16, nz=16, nt=1)
K = 16
rng = np.random.default_rng(0)
n = geom.n_cells * 8
sp = sort_by_cell(ParticleArrays(
    r=jnp.asarray(rng.random((n, 3)) * np.array(geom.L), jnp.float32),
    p=jnp.asarray(rng.standard_normal((n, 3)) * 0.02, jnp.float32),
    alive=jnp.ones(n, bool)), geom)
st = bin_state(sp, geom, K)

from xpic_tpu.parallel.mesh import state_sharding
from xpic_tpu.ops.binning import BinnedState


def step_hlo(mesh_shape):
    """Optimized HLO of the fused step on a mesh (1-D, 2-D or the full
    3-axis decomposition — the -da_processors_* analogs)."""
    mesh = pm.make_mesh(mesh_shape)
    shape = (3,) + geom.shape
    E, B, B0 = pm.shard_fields(mesh, jnp.zeros(shape, jnp.float32),
                               jnp.zeros(shape, jnp.float32),
                               jnp.zeros(shape, jnp.float32))
    sst = BinnedState(
        r=jax.device_put(st.r, state_sharding(mesh, 3)),
        p=jax.device_put(st.p, state_sharding(mesh, 3)),
        valid=jax.device_put(st.valid, state_sharding(mesh, 2)))
    lowered = jax.jit(
        lambda E, B, B0, s: ecsim_step_binned(
            E, B, B0, s, geom, q=-1.0, m=1.0, mpw=0.125)
    ).lower(E, B, B0, sst)
    return lowered.compile().as_text()

G = geom.n_cells
big = {
    "L_blocks": G * 3 * 12 * 3 * 12,          # full mass-matrix blocks
    "particle_cols": G * K,                   # one full payload column
    "weights_W": G * K * 3 * 12,              # full slot weights
}

def audit(hlo):
  counts = collections.Counter()
  suspicious = []
  for line in hlo.splitlines():
      op = None
      for name in ("all-gather", "all-to-all", "collective-permute",
                   "reduce-scatter", "all-reduce"):
          if name + "(" in line or name + "-start(" in line:
              op = name
              break
      if not op:
          continue
      counts[op] += 1
      shp = re.search(r"= \w+\[([\d,]*)\]", line)
      if shp:
          dims = [int(x) for x in shp.group(1).split(",") if x]
          size = int(np.prod(dims)) if dims else 1
          if size >= min(big.values()):
              which = [k for k, v in big.items() if size >= v]
              suspicious.append({"op": op, "shape": dims, "size": size,
                                 "as_big_as": which})
  return {"collective_counts": dict(counts),
          "suspicious": suspicious[:20],
          "n_suspicious": len(suspicious)}


out = {"big_tensor_sizes": big}
for label, shape in (("1d_z8", 8), ("3d_z2y2x2", (2, 2, 2))):
    out[label] = audit(step_hlo(shape))
print(json.dumps(out, indent=1))
