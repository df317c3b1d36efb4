"""Cell-binned (padded) particle views.

A sorted species is augmented with a dense ``[n_cells, K]`` index map
(K = per-cell capacity).  Every gather/scatter kernel then runs as dense
arithmetic over the ``[n_cells, K]`` layout with *cell-anchored* stencil
windows, so deposits reduce with plain sums plus a handful of rolled
grid adds — no atomic scatters (the TPU answer to the reference's
``#pragma omp atomic`` scatter loops, src/impls/ecsim/particles.cpp:137-142).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..config import Geometry
from ..particles import ParticleArrays, cell_ids


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BinnedSpecies:
    """Padded per-cell view of one (cell-sorted) species.

    ``index[g, k]`` is the flat particle index of slot k in cell g (an
    arbitrary in-bounds index for invalid slots); ``valid[g, k]`` masks
    real particles. ``r``/``p`` are the gathered per-slot coordinates in
    grid units and velocities.
    """

    index: jax.Array  # [G, K] int32
    valid: jax.Array  # [G, K] bool
    r: jax.Array  # [G, K, 3] positions in grid units (x/dx, y/dy, z/dz)
    p: jax.Array  # [G, K, 3]
    seg: jax.Array  # [G + 1] int32 segment starts (first flat index per cell)

    @property
    def n_cells(self) -> int:
        return self.index.shape[0]

    @property
    def slots(self) -> int:
        return self.index.shape[1]


def max_per_cell(sp: ParticleArrays, geom: Geometry) -> int:
    """Host-side: the maximum particle count of any cell (for choosing K)."""
    import numpy as np

    ids = np.asarray(cell_ids(sp, geom))
    ids = ids[ids < geom.n_cells]
    if ids.size == 0:
        return 0
    return int(np.bincount(ids, minlength=geom.n_cells).max())


def choose_slots(k_max: int, pad: int = 8) -> int:
    """Round the per-cell capacity up to a lane-friendly bucket."""
    return max(pad, ((k_max + pad - 1) // pad) * pad)


@partial(jax.jit, static_argnames=("geom", "slots"))
def bin_sorted(sp: ParticleArrays, geom: Geometry, slots: int) -> BinnedSpecies:
    """Build the padded view of a cell-sorted species.

    Requires ``sp`` sorted by flat cell id (see
    :func:`xpic_tpu.particles.sort_by_cell`).  Slot-within-cell comes
    from a searchsorted against the first occurrence of each id; the
    single scatter below has unique destination indices, which XLA
    lowers efficiently.
    """
    n = sp.r.shape[0]
    ids = cell_ids(sp, geom)  # sorted; dead -> n_cells
    G = geom.n_cells

    # Segment starts per cell by binary search over the G+1 cell
    # boundaries (cheap: G queries, not n) — the padded view is then a
    # pure gather, which lowers much better on TPU than the equivalent
    # scatter-pad.
    seg = jnp.searchsorted(ids, jnp.arange(G + 1, dtype=jnp.int32)).astype(
        jnp.int32
    )
    k = jnp.arange(slots, dtype=jnp.int32)[None, :]
    pos = seg[:G, None] + k
    valid = pos < seg[1:, None]
    index = jnp.minimum(pos, n - 1)

    # One packed gather (24-byte rows) instead of two 12-byte ones —
    # TPU dynamic-gather cost scales with descriptor count, not bytes.
    d = jnp.asarray([geom.dx, geom.dy, geom.dz], dtype=sp.r.dtype)
    rp = jnp.concatenate([sp.r / d, sp.p], axis=1)[index]
    r, p = rp[..., :3], rp[..., 3:]

    # Park invalid slots at the cell's own center so their (masked)
    # weights stay finite and cell-anchored windows remain valid.
    g = jnp.arange(G, dtype=jnp.int32)
    center = jnp.stack(
        [
            (g % geom.nx).astype(sp.r.dtype) + 0.5,
            ((g // geom.nx) % geom.ny).astype(sp.r.dtype) + 0.5,
            (g // (geom.nx * geom.ny)).astype(sp.r.dtype) + 0.5,
        ],
        axis=-1,
    )[:, None, :]
    r = jnp.where(valid[..., None], r, center)
    p = jnp.where(valid[..., None], p, 0.0)
    return BinnedSpecies(index=index, valid=valid, r=r, p=p, seg=seg)


def scatter_back(binned: BinnedSpecies, values: jax.Array, n: int,
                 ids: jax.Array | None = None) -> jax.Array:
    """Per-slot values [G, K, ...] back to flat particle order [n, ...].

    Formulated as a *gather*, not a scatter: the view was built from a
    cell-sorted species, so flat slot ``i`` lives at
    ``(g, k) = (ids[i], i - seg[ids[i]])``.  TPU scatters of small rows
    are ~10x slower than the equivalent gather (measured 110 ms vs
    12 ms for 2.6M rows on v5e), so the inverse permutation is read
    back instead of written forward.  ``ids`` are the (sorted) flat
    cell ids; when omitted they are recomputed from ``binned.seg``.
    Slots the view dropped (overflow beyond K, dead) read zeros.
    """
    G, K = binned.index.shape
    if ids is None:
        # invert seg: ids[i] = the cell whose segment contains i
        ids = (
            jnp.searchsorted(binned.seg, jnp.arange(n, dtype=jnp.int32),
                             side="right").astype(jnp.int32) - 1
        )
    g = jnp.minimum(ids, G)
    k = jnp.arange(n, dtype=jnp.int32) - binned.seg[g]
    ok = (ids < G) & (k >= 0) & (k < K)
    gk = jnp.where(ok, g * K + jnp.clip(k, 0, K - 1), 0)
    flat = values.reshape((G * K,) + values.shape[2:])[gk]
    mask = ok.reshape((n,) + (1,) * (values.ndim - 2))
    return jnp.where(mask, flat, 0)
