"""Host-side simulation orchestration (template method).

Mirrors ``interfaces::Simulation`` (src/interfaces/simulation.cpp:16-112):
initialize -> build commands/diagnostics -> run presets -> main loop of
[step-presets, timestep_implementation, diagnostics].  The per-step
physics lives in jitted functions owned by each scheme; everything here
is glue that runs on the host between steps.

Distribution: when the config requests more than one device (``"Mesh"``
key — the analog of ``mpiexec -n N -da_processors_*``,
src/utils/world.cpp:36-46), fields are placed with a z-sharded layout
and species with the aligned cell-axis sharding at initialization; all
scheme kernels are written in global semantics, so GSPMD partitions the
same jitted step over the mesh (SURVEY §2.7).
"""

from __future__ import annotations

import logging
import os
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, Geometry, SortParameters, PERIODIC
from ..particles import ParticleArrays, make_empty
from ..ops.binning import (
    BinnedState,
    bin_state,
    choose_slots,
    max_per_cell,
    unbin_state,
)

log = logging.getLogger("xpic")


class Species:
    """Host wrapper pairing static sort parameters with the device arrays.

    Storage is dual: the *binned* ``BinnedState`` ([G, K] padded per-cell
    layout — what every scheme kernel consumes, the TPU counterpart of the
    reference's ``std::vector<std::list<Point>>``, src/interfaces/particles.h:32)
    and the *flat* ``ParticleArrays`` view (what the command layer and
    checkpointing consume).  Whichever side was written last is
    authoritative; the other is derived lazily.
    """

    def __init__(self, params: SortParameters, arrays: ParticleArrays,
                 geom: Geometry, mesh=None):
        self.params = params
        self.geom = geom
        self.mesh = mesh
        self._flat: ParticleArrays | None = arrays
        self._binned: BinnedState | None = None
        self.slots = 0  # current binned per-cell capacity (K)
        # Host-tracked particle count: commands update it exactly; open
        # boundaries may kill particles, in which case the owning scheme
        # refreshes it (used only to skip work for empty species, so a
        # stale over-estimate is harmless).
        self.n = 0
        # Particles that changed cell in the last checked migration (the
        # reference's per-exchange sent/received statistic).
        self.migrated = 0

    # -- flat view ------------------------------------------------------
    @property
    def arrays(self) -> ParticleArrays:
        """Flat [C] view.  When derived from the binned state it is
        cell-major with dead padding interleaved (masked by ``alive``) —
        safe for reductions/dumps, NOT sorted for ``bin_sorted``."""
        if self._flat is None:
            self._flat = unbin_state(self._binned, self.geom)
        return self._flat

    @arrays.setter
    def arrays(self, value: ParticleArrays) -> None:
        self._flat = value
        self._binned = None

    # -- binned view ------------------------------------------------------
    @property
    def state(self) -> BinnedState:
        if self._binned is None:
            k = max_per_cell(self._flat, self.geom)
            # Headroom above the observed max load: cells keep churning
            # particles, and a checked rebin treats overflow as a hard
            # error (the proactive growth in check_load needs slack to
            # act before any drop can happen).
            slots = choose_slots(max(k, 1) + max(4, k // 8))
            if slots > self.slots or slots * 2 < self.slots:
                self.slots = slots
            st = bin_state(self._flat, self.geom, self.slots)
            self._binned = self._shard_state(st)
        return self._binned

    @state.setter
    def state(self, st: BinnedState) -> None:
        self._binned = st
        self.slots = st.slots
        self._flat = None

    def _shard_state(self, st: BinnedState) -> BinnedState:
        if self.mesh is None:
            return st
        from ..parallel.mesh import state_sharding

        s2 = state_sharding(self.mesh, 2)
        s3 = state_sharding(self.mesh, 3)
        return BinnedState(
            r=jax.device_put(st.r, s3),
            p=jax.device_put(st.p, s3),
            valid=jax.device_put(st.valid, s2),
        )

    def grow_slots(self, k_needed: int) -> None:
        """Grow the per-cell capacity to hold ``k_needed`` (between steps;
        triggers one retrace of the step at the new K)."""
        new_slots = choose_slots(k_needed)
        if new_slots <= self.slots:
            return
        flat = self.arrays  # materialize from the current binned state
        self.slots = new_slots
        self._binned = self._shard_state(bin_state(flat, self.geom, new_slots))
        self._flat = None

    def count(self) -> int:
        """Exact live count (device sync)."""
        if self._binned is not None:
            self.n = int(np.asarray(jnp.sum(self._binned.valid)))
        else:
            self.n = int(np.asarray(self._flat.alive).sum())
        return self.n

    def log_distribution(self) -> None:
        """Log a 128-bin per-axis momentum histogram (the reference's
        ``Particles::log_distribution``, interfaces/particles.cpp:295-326:
        bin = floor(p * 64) + 64, i.e. p in [-1, 1) c-units)."""
        hist_w = 128
        hist_h = hist_w // 2
        flat = self.arrays
        p = np.asarray(flat.p)[np.asarray(flat.alive)]
        if p.size == 0:
            return
        bins = np.clip((p * hist_h).astype(np.int64) + hist_h, 0, hist_w - 1)
        hist = np.stack(
            [np.bincount(bins[:, ax], minlength=hist_w) for ax in range(3)]
        )
        log.debug("    %s velocity distribution histogram:",
                  self.params.sort_name)
        log.debug("    %3s  %6s: %9s %9s %9s",
                  "bin", "v[c]", "hist[X]", "hist[Y]", "hist[Z]")
        for i in range(hist_w):
            if not hist[:, i].any():
                continue
            log.debug("    %3d  % 5.3f: %9d %9d %9d",
                      i, i / hist_h - 1.0, hist[0, i], hist[1, i],
                      hist[2, i])


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

        self.mesh = None
        if cfg.n_devices > 1:
            from ..parallel import mesh as pm
            from ..parallel import step as pstep

            if len(jax.devices()) < cfg.n_devices:
                raise RuntimeError(
                    f"config requests {cfg.n_devices} devices, "
                    f"only {len(jax.devices())} available"
                )
            # Pallas kernels run per-shard via shard_map under the
            # mesh (parallel/step._shardmap_fill / ops/neighbor_rebin);
            # pl.pallas_call itself has no SPMD partitioning rule.
            self.mesh = pm.make_mesh(cfg.mesh_shape)

        g = self.geom
        shape = (3, g.nz, g.ny, g.nx)
        self.E = self._shard_field(jnp.zeros(shape))
        self.B = self._shard_field(jnp.zeros(shape))
        self.B0 = self._shard_field(jnp.zeros(shape))
        self.J = self._shard_field(jnp.zeros(shape))

    def _shard_field(self, F):
        if self.mesh is None:
            return F
        from ..parallel.mesh import field_sharding

        return jax.device_put(F, field_sharding(self.mesh))

    # -- lifecycle ----------------------------------------------------
    def initialize(self) -> None:
        os.makedirs(os.path.join(self.cfg.out_dir, "temporal"), exist_ok=True)
        for params in self.cfg.sorts:
            self.species.append(
                Species(params, make_empty(256), self.geom, self.mesh)
            )
            self._log_cfl(params)
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
        for sp in self.species:
            sp.count()  # seed the host-tracked counts
            if log.isEnabledFor(logging.DEBUG):
                sp.log_distribution()

        for diag in self.diagnostics:
            diag.diagnose(self.start)

    def calculate(self) -> None:
        log.info("Running the main simulation cycle")
        diag_prev = 0.0  # diagnostics cost of the previous step
        for t in range(self.start + 1, self.geom.nt + 1):
            t0 = time.perf_counter()
            for command in self.step_presets:
                command.execute(t)
            self.timestep_implementation(t)
            t1 = time.perf_counter()
            # Stable key set before the diagnostics run so LogView rows
            # keep a constant column layout (log_view.h:29-60).
            self.timings = {"step": t1 - t0, "diagnostics": diag_prev}
            for diag in self.diagnostics:
                diag.diagnose(t)
            t2 = time.perf_counter()
            diag_prev = t2 - t1
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
    def _log_cfl(self, params: SortParameters) -> None:
        """Thermal-CFL guard at species init: log how many cells a
        thermal particle crosses per dt (the reference's species-init
        check, src/interfaces/simulation.tpp:68-77).  Sub-cell kernels
        (Esirkepov width-6 windows, eccapfim's 4-segment split) assume
        < 1 cell per dt per axis."""
        from ..config import thermal_velocity

        T = max(params.Tx, params.Ty, params.Tz)
        if T <= 0.0 or params.m <= 0.0:
            return
        v_th = thermal_velocity(T, params.m)
        g = self.geom
        cells = v_th * g.dt / min(g.dx, g.dy, g.dz)
        log.info(
            "  %s: thermal velocity %.3e [c], crosses %.3f cells per dt",
            params.sort_name, v_th, cells,
        )
        if cells > 1.0:
            log.warning(
                "  %s: v_th dt/dx = %.2f > 1 — deposits assume sub-cell "
                "moves per step; reduce dt or expect flagged errors",
                params.sort_name, cells,
            )

    def rebin_all(self) -> None:
        """Ensure every species' binned state is fresh (the analog of
        ``update_cells_*``, src/interfaces/particles.cpp:79-248).  With
        dual storage this is just forcing the lazy flat->binned
        conversion; scheme steps migrate the binned state in-place."""
        for sp in self.species:
            sp.state  # noqa: B018 — property access triggers the rebin

    def check_load(self, sp: Species, load) -> None:
        """Police the per-cell capacity after a checked rebin.

        ``load = [max_per_cell, dropped, moved]``.  Any dropped particle
        is a hard error (the reference's list cells cannot overflow); a
        cell within 2 of capacity grows K for the next step.  ``moved``
        is kept as the per-step exchange statistic (the reference logs
        sent/received counts per migration,
        interfaces/particles.cpp:227-246).
        """
        vals = [int(v) for v in np.asarray(load)]
        max_load, dropped = vals[0], vals[1]
        sp.migrated = vals[2] if len(vals) > 2 else 0
        if log.isEnabledFor(logging.DEBUG):
            log.debug(
                "  %s: %d particles changed cell (max load %d / K=%d)",
                sp.params.sort_name, sp.migrated, max_load, sp.slots,
            )
        if dropped:
            raise RuntimeError(
                f"species {sp.params.sort_name!r}: {dropped} particles "
                f"dropped — per-cell capacity K={sp.slots} exceeded "
                f"(max load {max_load}); increase capacity headroom"
            )
        if max_load > sp.slots - 4:
            sp.grow_slots(max_load + 8)

    def binned(self, sp: Species) -> BinnedState:
        return sp.state

    def refresh_counts(self) -> None:
        """Re-sync host particle counts after a phase that may kill
        particles (open boundaries)."""
        if any(b != PERIODIC for b in self.geom.bounds):
            for sp in self.species:
                sp.count()

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
