"""Energy tables: temporal/energy.txt and temporal/energy_conservation.txt.

Reference: src/diagnostics/energy.cpp.  Field energy is 0.5*||F||^2
summed over the grid (no cell-volume factor, matching VecNorm);
kinetic energy is 0.5*m*(n/Np)*sum p^2.  The conservation table lists
per-step deltas plus command source/sink terms and the closing
dE+dB+dK column.  The ecsimcorr subclass appends the per-species work
bookkeeping columns (src/impls/ecsimcorr/simulation.cpp:170-199).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .tables import TableDiagnostic


@jax.jit
def _field_stats(F):
    en = 0.5 * jnp.sum(F * F)
    sums = jnp.sum(F, axis=(1, 2, 3))  # per-component sums (VecStrideSumAll)
    return en, sums


@jax.jit
def _kinetic_stats(p, alive):
    m = alive[:, None]
    comp = jnp.sum(jnp.where(m, p, 0.0), axis=0)
    w = jnp.sum(jnp.where(alive, jnp.sum(p * p, axis=1), 0.0))
    n = jnp.sum(alive)
    return comp, w, n


@jax.jit
def _all_stats(E, B, species_p, species_alive):
    """All Energy-diagnostic reductions in one device round trip:
    returns a flat stats vector [2 + 2*3 + 5*n_species]."""
    en_E, sums_E = _field_stats(E)
    en_B, sums_B = _field_stats(B)
    parts = [jnp.stack([en_E, en_B]), sums_E, sums_B]
    for p, alive in zip(species_p, species_alive):
        comp, w, n = _kinetic_stats(p, alive)
        parts.append(jnp.concatenate([comp, jnp.stack([w, n.astype(p.dtype)])]))
    return jnp.concatenate(parts)


class Energy:
    def __init__(self, simulation):
        self.simulation = simulation
        out = simulation.cfg.out_dir
        self.energy = TableDiagnostic(os.path.join(out, "temporal", "energy.txt"))
        self.energy_cons = TableDiagnostic(
            os.path.join(out, "temporal", "energy_conservation.txt")
        )
        ns = len(simulation.species)
        self.E = self.E0 = 0.0
        self.B = self.B0v = 0.0
        self.std_E = self.std_B = 0.0
        self.K = [0.0] * ns
        self.K0 = [0.0] * ns
        self.std_K = [0.0] * ns

    # -- physics ------------------------------------------------------
    def calculate(self):
        """One fused device round trip for every reduction the tables
        need (dispatch latency dominates on tunneled backends)."""
        sim = self.simulation
        g3 = sim.geom.n_cells
        stats = np.asarray(
            _all_stats(
                sim.E, sim.B,
                tuple(sp.arrays.p for sp in sim.species),
                tuple(sp.arrays.alive for sp in sim.species),
            )
        )
        self.E = float(stats[0])
        self.B = float(stats[1])
        sums_E = stats[2:5]
        sums_B = stats[5:8]
        self.std_E = float(
            np.sqrt(max(self.E - 0.5 * float(np.sum(sums_E**2)) / g3, 0.0) / g3)
        )
        self.std_B = float(
            np.sqrt(max(self.B - 0.5 * float(np.sum(sums_B**2)) / g3, 0.0) / g3)
        )
        off = 8
        for i, sp in enumerate(self.simulation.species):
            comp = stats[off : off + 3]
            w = float(stats[off + 3])
            n = int(round(float(stats[off + 4])))
            off += 5
            frac = 0.5 * sp.params.m * sp.params.n_Np
            if n == 0:
                self.K[i] = 0.0
                self.std_K[i] = 0.0
                continue
            self.K[i] = frac * w
            s = w - float(np.sum(comp**2)) / n
            self.std_K[i] = frac * np.sqrt(abs(s) / n)

    # Back-compat shims (used by subclasses/tests)
    def calculate_field(self):
        self.calculate()

    def calculate_kinetic(self):
        pass

    # -- table filling ------------------------------------------------
    def diagnose(self, t: int) -> None:
        if t == 0:
            self.calculate()
        self.E0, self.B0v, self.K0 = self.E, self.B, list(self.K)
        self.calculate()
        self.fill_energy(t)
        self.fill_energy_cons(t)
        period = self.simulation.geom.diagnose_period
        self.energy.commit(t, period)
        self.energy_cons.commit(t, period)

    def fill_energy(self, t: int) -> None:
        tb = self.energy
        tb.add(6, "Time", t, "{:d}")
        tb.add(13, "wE", self.E)
        tb.add(13, "wB", self.B)
        for i, sp in enumerate(self.simulation.species):
            tb.add(13, "wK_" + sp.params.sort_name, self.K[i])
        tb.add(13, "sE", self.std_E)
        tb.add(13, "sB", self.std_B)
        for i, sp in enumerate(self.simulation.species):
            tb.add(13, "sK_" + sp.params.sort_name, self.std_K[i])

    def fill_energy_cons(self, t: int) -> None:
        tb = self.energy_cons
        tb.add(6, "Time", t, "{:d}")
        dE = self.E - self.E0
        dB = self.B - self.B0v
        dF = dE + dB
        tb.add(13, "dE", dE)
        tb.add(13, "dB", dB)
        dK = 0.0
        for i, sp in enumerate(self.simulation.species):
            tb.add(13, "dK_" + sp.params.sort_name, self.K[i] - self.K0[i])
            dK += self.K[i] - self.K0[i]

        # Source/sink terms from step presets
        # (reference: energy.cpp:160-180).
        from ..commands.fields_damping import FieldsDamping
        from ..commands.inject_particles import InjectParticles
        from ..commands.remove_particles import RemoveParticles

        for command in self.simulation.step_presets:
            if isinstance(command, FieldsDamping):
                tb.add(13, "Damped(E+B)", command.get_damped_energy())
                dF += command.get_damped_energy()
            if isinstance(command, InjectParticles):
                tb.add(13, "Inj_" + command.get_ionized_name(),
                       command.get_ionized_energy())
                tb.add(13, "Inj_" + command.get_ejected_name(),
                       command.get_ejected_energy())
                dK -= command.get_ionized_energy() + command.get_ejected_energy()
            if isinstance(command, RemoveParticles):
                tb.add(13, "Rm_" + command.get_particles_name(),
                       command.get_removed_energy())
                dK += command.get_removed_energy()
        self._dK = dK
        tb.add(13, "dE+dB+dK", dF + dK)

    def finalize(self) -> None:
        self.energy.finalize()
        self.energy_cons.finalize()


class EcsimcorrEnergy(Energy):
    """Adds the ecsimcorr work-bookkeeping columns
    (src/impls/ecsimcorr/simulation.cpp:170-199)."""

    def fill_energy_cons(self, t: int) -> None:
        super().fill_energy_cons(t)
        tb = self.energy_cons
        sim = self.simulation
        dt = sim.geom.dt
        off = 3
        corr_w_total = 0.0
        for sp in sim.species:
            name = sp.params.sort_name
            stats = getattr(sp, "corr_stats", None)
            if stats is None:
                stats = dict(lambda_dK=0.0, pred_dK=0.0, corr_dK=0.0,
                             pred_w=0.0, corr_w=0.0)
            cwd = stats["lambda_dK"]
            pwd = stats["pred_dK"] - dt * stats["pred_w"]
            ldk = stats["corr_dK"] - dt * stats["corr_w"]
            corr_w_total += stats["corr_w"]
            off += 1
            tb.add(13, "CWD_" + name, cwd, pos=off)
            off += 1
            tb.add(13, "PWD_" + name, pwd, pos=off)
            off += 1
            tb.add(13, "LdK_" + name, ldk, pos=off)
            off += 1
        tb.add(13, "WD", self._dK - dt * corr_w_total)
