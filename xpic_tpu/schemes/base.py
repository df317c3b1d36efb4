"""Host-side simulation orchestration (template method).

Mirrors ``interfaces::Simulation`` (src/interfaces/simulation.cpp:16-112):
initialize -> build commands/diagnostics -> run presets -> main loop of
[step-presets, timestep_implementation, diagnostics].  The per-step
physics lives in jitted functions owned by each scheme; everything here
is glue that runs on the host between steps.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Any

import jax.numpy as jnp
import numpy as np

from ..config import Config, Geometry, SortParameters
from ..particles import ParticleArrays, make_empty, sort_by_cell
from ..ops.binning import bin_sorted, choose_slots, max_per_cell

log = logging.getLogger("xpic")


class Species:
    """Host wrapper pairing static sort parameters with the device arrays."""

    def __init__(self, params: SortParameters, arrays: ParticleArrays):
        self.params = params
        self.arrays = arrays
        self.slots = 0  # current binned per-cell capacity (K)

    def count(self) -> int:
        return int(np.asarray(self.arrays.alive).sum())


class Simulation:
    scheme_name = "base"

    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.geom: Geometry = cfg.geometry
        self.start = 0
        self.species: list[Species] = []
        self.diagnostics: list[Any] = []
        self.step_presets: list[Any] = []
        self.timings: dict[str, float] = {}

        g = self.geom
        shape = (3, g.nz, g.ny, g.nx)
        self.E = jnp.zeros(shape)
        self.B = jnp.zeros(shape)
        self.B0 = jnp.zeros(shape)
        self.J = jnp.zeros(shape)

    # -- lifecycle ----------------------------------------------------
    def initialize(self) -> None:
        os.makedirs(os.path.join(self.cfg.out_dir, "temporal"), exist_ok=True)
        for params in self.cfg.sorts:
            self.species.append(Species(params, make_empty(256)))
        self.initialize_implementation()

        from ..commands import build_commands
        from ..diagnostics import build_diagnostics, default_diagnostics

        presets = build_commands(self, self.cfg.presets)
        self.step_presets = build_commands(self, self.cfg.step_presets)

        self.diagnostics = default_diagnostics(self)
        self.diagnostics += build_diagnostics(self, self.cfg.diagnostics)

        log.info("Executing presets")
        for preset in presets:
            preset.execute(self.start)
        self.rebin_all()

        for diag in self.diagnostics:
            diag.diagnose(self.start)

    def calculate(self) -> None:
        log.info("Running the main simulation cycle")
        for t in range(self.start + 1, self.geom.nt + 1):
            t0 = time.perf_counter()
            for command in self.step_presets:
                command.execute(t)
            self.timestep_implementation(t)
            t1 = time.perf_counter()
            for diag in self.diagnostics:
                diag.diagnose(t)
            t2 = time.perf_counter()
            self.timings = {"step": t1 - t0, "diagnostics": t2 - t1}
            log.info(
                "Timestep = %.4f [1/w_pe] = %d [dt] (%.3fs step, %.3fs diag)",
                t * self.geom.dt, t, t1 - t0, t2 - t1,
            )

    def finalize(self) -> None:
        for command in self.step_presets:
            if hasattr(command, "finalize"):
                command.finalize()
        for diag in self.diagnostics:
            if hasattr(diag, "finalize"):
                diag.finalize()

    # -- helpers ------------------------------------------------------
    def rebin_all(self) -> None:
        """Sort species by cell and refresh the per-cell capacity K.

        Replaces ``update_cells_*`` (src/interfaces/particles.cpp:79-248);
        K only grows (or shrinks when the max load halves) to keep jit
        caches stable.
        """
        for sp in self.species:
            sp.arrays = sort_by_cell(sp.arrays, self.geom)
            k = max_per_cell(sp.arrays, self.geom)
            slots = choose_slots(max(k, 1))
            if slots > sp.slots or slots * 2 < sp.slots:
                sp.slots = slots

    def binned(self, sp: Species):
        return bin_sorted(sp.arrays, self.geom, sp.slots)

    def get_named_particles(self, name: str) -> Species:
        for sp in self.species:
            if sp.params.sort_name == name:
                return sp
        raise KeyError(f"no particles with name {name!r}")

    def get_named_field(self, name: str):
        return {"E": self.E, "B": self.B, "B0": self.B0, "J": self.J}[name]

    # -- abstract -----------------------------------------------------
    def initialize_implementation(self) -> None:
        raise NotImplementedError

    def timestep_implementation(self, t: int) -> None:
        raise NotImplementedError
