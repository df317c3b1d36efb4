"""Boundary handling: periodic wrap vs open (ghosted) particle loss,
and zero-filled field stencils on non-periodic axes."""

import jax.numpy as jnp
import numpy as np

from xpic_tpu.config import GHOSTED, PERIODIC, Geometry
from xpic_tpu.ops.stencil import curl_positive
from xpic_tpu.particles import ParticleArrays, apply_boundaries


def geom_with(bounds):
    return Geometry(dx=0.5, dy=0.5, dz=0.5, dt=0.1, nx=4, ny=4, nz=4, nt=1,
                    bounds=bounds)


def test_periodic_wrap():
    geom = geom_with((PERIODIC, PERIODIC, PERIODIC))
    sp = ParticleArrays(
        r=jnp.asarray([[-0.1, 0.5, 2.3]]),  # below in x
        p=jnp.asarray([[1.0, 0.0, 0.0]]),
        alive=jnp.ones(1, bool),
    )
    out = apply_boundaries(sp, geom)
    np.testing.assert_allclose(np.asarray(out.r)[0, 0], 2.0 - 0.1)
    assert bool(out.alive[0])


def test_open_boundary_drops():
    geom = geom_with((PERIODIC, PERIODIC, GHOSTED))
    sp = ParticleArrays(
        r=jnp.asarray([[0.5, 0.5, 2.5], [0.5, 0.5, 1.0]]),  # first out in z
        p=jnp.zeros((2, 3)),
        alive=jnp.ones(2, bool),
    )
    out = apply_boundaries(sp, geom)
    assert not bool(out.alive[0])
    assert bool(out.alive[1])


def test_reflective_clamps_and_flips_momentum():
    """g_bound_reflective (src/interfaces/point.cpp:3-17): coordinate
    clamps to the wall and that momentum component flips sign."""
    from xpic_tpu.config import REFLECTIVE

    geom = geom_with((PERIODIC, PERIODIC, REFLECTIVE))
    sp = ParticleArrays(
        r=jnp.asarray([[0.5, 0.5, 2.5], [0.5, 0.5, -0.2], [0.5, 0.5, 1.0]]),
        p=jnp.asarray([[0.1, 0.2, 0.3], [0.1, 0.2, -0.3], [0.1, 0.2, 0.3]]),
        alive=jnp.ones(3, bool),
    )
    out = apply_boundaries(sp, geom)
    r, p = np.asarray(out.r), np.asarray(out.p)
    assert bool(out.alive.all())
    np.testing.assert_allclose(r[0, 2], 2.0)   # clamped to z = Lz
    np.testing.assert_allclose(p[0, 2], -0.3)  # flipped
    np.testing.assert_allclose(r[1, 2], 0.0)
    np.testing.assert_allclose(p[1, 2], 0.3)
    np.testing.assert_allclose(p[2], [0.1, 0.2, 0.3])  # interior untouched


def test_reflective_binned_drift():
    """The fused drift applies the same reflective map (ops/binning)."""
    from xpic_tpu.config import REFLECTIVE
    from xpic_tpu.ops.binning import bin_state, _drift_impl

    geom = Geometry(dx=0.5, dy=0.5, dz=0.5, dt=1.0, nx=4, ny=4, nz=4,
                    nt=1, bounds=(PERIODIC, PERIODIC, REFLECTIVE))
    sp = ParticleArrays(
        r=jnp.asarray([[0.5, 0.5, 1.9]]),
        p=jnp.asarray([[0.0, 0.0, 0.2]]),  # drifts to z=2.1 > Lz
        alive=jnp.ones(1, bool),
    )
    st = _drift_impl(bin_state(sp, geom, 4), geom)
    k = int(jnp.argmax(st.valid.reshape(-1)))
    r = np.asarray(st.r.reshape(-1, 3))[k]
    p = np.asarray(st.p.reshape(-1, 3))[k]
    # grid units: z clamped to nz = 4 cells, momentum flipped
    np.testing.assert_allclose(r[2], 4.0)
    np.testing.assert_allclose(p[2], -0.2)
    assert int(st.valid.sum()) == 1


def test_ghosted_stencil_zero_fill():
    """Non-periodic axes read zeros outside the domain (the analog of
    the reference's remap dropping out-of-range entries,
    operators.cpp:27-43)."""
    geom = geom_with((PERIODIC, PERIODIC, GHOSTED))
    F = jnp.ones((3,) + geom.shape)
    c = np.asarray(curl_positive(F, geom.cell_steps, geom.bounds))
    # Interior: curl of constant field = 0; at the z+ face the forward
    # difference reads a zero ghost -> nonzero curl there only.
    assert np.allclose(c[:, :-1, :, :], 0.0)
    assert not np.allclose(c[0, -1, :, :], 0.0)
