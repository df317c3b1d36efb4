"""Diagnostics: tables, field dumps, moments, backup.

``default_diagnostics`` auto-appends Energy, ChargeConservation and
MomentumConservation exactly like the reference
(src/interfaces/simulation.cpp:41-56); ``build_diagnostics`` dispatches
the config ``Diagnostics`` section
(src/diagnostics/builders/diagnostic_builder.cpp:17-59).
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence


def default_diagnostics(simulation) -> list:
    from .energy import Energy, EcsimcorrEnergy
    from .charge_conservation import ChargeConservation
    from .momentum_conservation import MomentumConservation

    diags: list[Any] = []
    if simulation.scheme_name == "ecsimcorr":
        diags.append(EcsimcorrEnergy(simulation))
    else:
        diags.append(Energy(simulation))
    diags.append(ChargeConservation(simulation))
    diags.append(MomentumConservation(simulation))
    return diags


def build_diagnostics(simulation, infos: Sequence[Mapping[str, Any]]) -> list:
    from .field_view import FieldView
    from .distribution_moment import DistributionMoment
    from .velocity_distribution import VelocityDistribution
    from .log_view import LogView

    diags = []
    for info in infos or ():
        name = info.get("diagnostic")
        if name == "FieldView":
            diags.append(FieldView.from_json(simulation, info))
        elif name == "DistributionMoment":
            diags.append(DistributionMoment.from_json(simulation, info))
        elif name == "VelocityDistribution":
            diags.append(VelocityDistribution.from_json(simulation, info))
        elif name == "LogView":
            diags.append(LogView.from_json(simulation, info))
        else:
            raise ValueError(f"unknown diagnostic {name!r}")

    backup = getattr(simulation.cfg, "backup", None)
    if backup:
        from .simulation_backup import SimulationBackup

        diags.append(SimulationBackup.from_json(simulation, backup))
    return diags
