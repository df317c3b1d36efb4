"""Decomposition invariance: same step, 1 device vs 8-device mesh.

The reference re-runs its golden tests under ``mpiexec -np 2
-da_processors_x 2`` and requires identical tables
(tests/ecsim/CMakeLists.txt:16-18).  Here the same jitted ECSIM step
runs unsharded and sharded over the 8 virtual CPU devices (conftest
sets --xla_force_host_platform_device_count=8); results must agree to
roundoff.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xpic_tpu.config import Geometry
from xpic_tpu.parallel import mesh as pm
from xpic_tpu.parallel.step import ecsim_step
from xpic_tpu.particles import ParticleArrays, sort_by_cell

GEOM = Geometry(dx=0.5, dy=0.5, dz=0.5, dt=1.5, nx=8, ny=8, nz=8, nt=1)


def make_state(seed=0):
    rng = np.random.default_rng(seed)
    n = GEOM.n_cells * 4
    r = rng.random((n, 3)) * np.array(GEOM.L)
    p = rng.standard_normal((n, 3)) * 0.02
    sp = sort_by_cell(
        ParticleArrays(r=jnp.asarray(r), p=jnp.asarray(p),
                       alive=jnp.ones(n, bool)),
        GEOM,
    )
    shape = (3,) + GEOM.shape
    return jnp.zeros(shape), jnp.zeros(shape), jnp.zeros(shape), sp


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_ecsim_step_decomposition_invariance():
    E, B, B0, sp = make_state()
    args = dict(geom=GEOM, slots=16, q=-1.0, m=1.0, mpw=0.25, maxit=50)

    E1, B1, sp1, c1, _ = ecsim_step(E, B, B0, sp, **args)

    mesh = pm.make_mesh(8)
    Es, Bs, B0s = pm.shard_fields(mesh, E, B, B0)
    sps = pm.shard_particles(mesh, sp)
    E8, B8, sp8, c8, _ = ecsim_step(Es, Bs, B0s, sps, **args)

    np.testing.assert_allclose(np.asarray(E1), np.asarray(E8), atol=1e-11)
    np.testing.assert_allclose(np.asarray(B1), np.asarray(B8), atol=1e-11)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c8), atol=1e-11)
    np.testing.assert_allclose(np.asarray(sp1.p), np.asarray(sp8.p),
                               atol=1e-12)
