"""DistributionMoment: particle->grid moment dumps.

Reference: src/diagnostics/distribution_moment.cpp — deposits per-particle
moment values as *cell-centered* quantities with a reduced order-1
spline (the diagnostic-local ``Shape``: shr=1, shw=2, spline_of_1st_order
at the half-shifted lattice, distribution_moment.cpp:125-155), weighted
by n/Np, then dumps float32 binaries in the FieldView layout under
``<out_dir>/<particles>/<moment><suffix>``.  This exact deposit is what
the committed expected dumps contain (tests/ecsim/expected/ecsim_ex1/
electrons/density) — reproduced bit-for-bit by the golden-parity tests.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Geometry
from ..ops.gather_scatter import cell_t, deposit_scalar
from .field_view import format_time

MOMENT_DOF = {
    "density": 1,
    "current": 3,
    "momentum_flux": 6,
    "momentum_flux_cyl": 6,
    "momentum_flux_diag": 3,
    "momentum_flux_diag_cyl": 3,
}


def _moment_values(name, params, r, p, Lx, Ly):
    """Per-slot moment component values [G, K, dof]
    (reference: distribution_moment.cpp:212-313)."""
    if name == "density":
        return jnp.ones(p.shape[:-1] + (1,), p.dtype)
    if name == "current":
        return params.q * p
    m = params.m
    if name == "momentum_flux":
        comps = [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]
        return jnp.stack([m * p[..., a] * p[..., b] for a, b in comps], axis=-1)
    if name == "momentum_flux_diag":
        return m * p * p
    # Cylindrical variants use the (r, phi, z) projection around the box axis.
    x = r[..., 0] - 0.5 * Lx
    y = r[..., 1] - 0.5 * Ly
    rr = jnp.hypot(x, y)
    safe = rr > 0
    inv = jnp.where(safe, 1.0 / jnp.where(safe, rr, 1.0), 0.0)
    vr = jnp.where(safe, (x * p[..., 0] + y * p[..., 1]) * inv, p[..., 0])
    va = jnp.where(safe, (-y * p[..., 0] + x * p[..., 1]) * inv, p[..., 1])
    vz = p[..., 2]
    v = jnp.stack([vr, va, vz], axis=-1)
    if name == "momentum_flux_cyl":
        comps = [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]
        return jnp.stack([m * v[..., a] * v[..., b] for a, b in comps], axis=-1)
    if name == "momentum_flux_diag_cyl":
        return m * v * v
    raise ValueError(f"unknown moment {name!r}")


class DistributionMoment:
    def __init__(self, simulation, species, moment: str, out_dir: str):
        self.simulation = simulation
        self.species = species
        self.moment = moment
        self.dof = MOMENT_DOF[moment]
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self._collect = None  # built lazily (after .region is known)

    @classmethod
    def from_json(cls, simulation, info):
        sp = simulation.get_named_particles(info["particles"])
        moment = info["moment"]
        if moment not in MOMENT_DOF:
            raise ValueError(f"unknown moment name {moment!r}")
        suffix = ""
        region = None
        if "region" in info:
            reg = info["region"]
            if "suffix" in reg:
                suffix = "_" + reg["suffix"]
            g = simulation.geom
            units = simulation.cfg.unit_table()
            from ..config import parse_value

            steps = (g.dx, g.dy, g.dz)
            start = [0, 0, 0]
            size = [g.nx, g.ny, g.nz]
            if "start" in reg:
                start = [int(parse_value(reg["start"][i], units) // steps[i])
                         for i in range(3)]
            if "size" in reg:
                size = [int(parse_value(reg["size"][i], units) // steps[i])
                        for i in range(3)]
            region = (tuple(start), tuple(size))
        out = os.path.join(
            simulation.cfg.out_dir, sp.params.sort_name, moment + suffix
        )
        obj = cls(simulation, sp, moment, out)
        obj.region = region
        return obj

    def _make_collect(self):
        geom = self.simulation.geom
        params = self.species.params
        moment = self.moment
        region = self.region

        if region is not None:
            # Region-local deposit (the reference's reduced-dof DA,
            # distribution_moment.cpp:125-155): gather only the cell
            # rows intersecting the region dilated by the deposit's
            # 1-cell spline halo (with periodic wrap — edge halo rows
            # ARE the periodic-image contributions) and deposit them
            # into a +2-padded sub-box whose cell-anchored windows
            # never wrap.  Cost scales with the region, not the grid,
            # and only the region crosses to the host.
            (sx, sy, sz), (rx, ry, rz) = region
            zs = np.arange(sz - 1, sz + rz + 1)
            ys = np.arange(sy - 1, sy + ry + 1)
            xs = np.arange(sx - 1, sx + rx + 1)
            # Halo rows wrap ONLY on periodic axes (edge halo rows ARE
            # the periodic-image contributions there); on reflective/
            # open axes out-of-domain halo rows contribute nothing —
            # matching deposit_scalar's zero-outside behavior on the
            # full grid — so they are masked dead instead of wrapped.
            from ..config import PERIODIC

            halo_ok = np.ones((len(zs), len(ys), len(xs)), bool)
            for ax, idx in ((0, xs), (1, ys), (2, zs)):
                n = (geom.nx, geom.ny, geom.nz)[ax]
                if geom.bounds[ax] != PERIODIC:
                    in_dom = (idx >= 0) & (idx < n)
                    shape = [1, 1, 1]
                    shape[2 - ax] = len(idx)
                    halo_ok &= in_dom.reshape(shape)
            zs, ys, xs = zs % geom.nz, ys % geom.ny, xs % geom.nx
            rows = jnp.asarray(
                ((zs[:, None, None] * geom.ny + ys[None, :, None])
                 * geom.nx + xs[None, None, :]).reshape(-1),
                jnp.int32)
            halo_ok = jnp.asarray(halo_ok.reshape(-1))
            sub_geom = Geometry(
                dx=geom.dx, dy=geom.dy, dz=geom.dz, dt=geom.dt,
                nx=rx + 2, ny=ry + 2, nz=rz + 2, nt=1)
        else:
            rows = None
            sub_geom = geom

        @jax.jit
        def collect(st):
            t = cell_t(geom, st.r)
            d = jnp.asarray(geom.cell_steps, st.r.dtype)
            vals = _moment_values(
                moment, params, st.r * d, st.p, geom.Lx, geom.Ly
            )
            valid = st.valid
            if rows is not None:
                t, vals = t[rows], vals[rows]
                valid = valid[rows] & halo_ok[:, None]
            outs = []
            for j in range(vals.shape[-1]):
                outs.append(
                    deposit_scalar(
                        vals[..., j] * params.n_Np,
                        t, valid, sub_geom, order=1, width=3, anchor=-1,
                        stag=True,
                    )
                )
            out = jnp.stack(outs, axis=-1)  # [nz', ny', nx', dof]
            if rows is not None:
                out = out[1:-1, 1:-1, 1:-1, :]
            return out

        return collect

    region: tuple | None = None

    def diagnose(self, t: int) -> None:
        sim = self.simulation
        if t % sim.geom.diagnose_period != 0:
            return
        if self._collect is None:
            self._collect = self._make_collect()
        data = np.asarray(
            self._collect(self.simulation.binned(self.species)),
            dtype=np.float32,
        )
        from .io import binary_dump

        binary_dump(os.path.join(self.out_dir, format_time(t, sim.geom.nt)),
                    np.ascontiguousarray(data))

    def finalize(self) -> None:
        from .io import flush_dumps

        flush_dumps()
