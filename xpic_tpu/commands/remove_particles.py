"""RemoveParticles step preset (reference: src/commands/remove_particles.cpp).

The reference clears whole cells whose corner lies outside the keep
geometry; here the per-particle position test gives the same behavior
in the continuum limit and is mask-parallel.
"""

from __future__ import annotations

import logging

import jax.numpy as jnp
import numpy as np

from ..particles import ParticleArrays
from .particles_load import load_box, load_cylinder

log = logging.getLogger("xpic")


class RemoveParticles:
    def __init__(self, species, tester, name=""):
        self.species = species
        self.tester = tester
        self.removed_energy = 0.0
        self.geometry_name = name

    @classmethod
    def from_json(cls, simulation, info):
        sp = simulation.get_named_particles(info["particles"])
        units = simulation.cfg.unit_table()
        gname = info["geometry"]["name"]
        if gname == "BoxGeometry":
            geom = load_box(info["geometry"], units)
        elif gname == "CylinderGeometry":
            geom = load_cylinder(info["geometry"], units)
        else:
            raise ValueError(f"unknown remove geometry {gname!r}")
        log.info("  RemoveParticles is added for %r", sp.params.sort_name)
        return cls(sp, geom.contains, gname)

    def get_particles_name(self) -> str:
        return self.species.params.sort_name

    def get_removed_energy(self) -> float:
        return self.removed_energy

    def execute(self, t: int) -> None:
        arr = self.species.arrays
        r = np.asarray(arr.r)
        alive = np.asarray(arr.alive)
        keep = self.tester(r)
        remove = alive & ~keep
        if not remove.any():
            self.removed_energy = 0.0
            return
        params = self.species.params
        w = 0.5 * params.m * params.n_Np
        p = np.asarray(arr.p)
        self.removed_energy = float(w * np.sum(p[remove] ** 2))
        alive = alive & keep
        self.species.arrays = ParticleArrays(
            r=arr.r, p=arr.p, alive=jnp.asarray(alive)
        )
        self.species.n = int(alive.sum())
        log.info(
            "  Removed %d particles from %r (energy %.4e)",
            int(remove.sum()), params.sort_name, self.removed_energy,
        )
