"""Time-integration schemes (reference: src/impls/).

``build_simulation`` dispatches on the config ``Simulation`` key exactly
like the reference factory (src/interfaces/simulation.cpp:160-182).
"""

from __future__ import annotations

from ..config import Config


def build_simulation(cfg: Config):
    from .basic import BasicSimulation
    from .ecsim import EcsimSimulation
    from .ecsimcorr import EcsimcorrSimulation
    from .eccapfim import EccapfimSimulation

    table = {
        "basic": BasicSimulation,
        "ecsim": EcsimSimulation,
        "ecsimcorr": EcsimcorrSimulation,
        "eccapfim": EccapfimSimulation,
    }
    if cfg.scheme not in table:
        raise ValueError(f"unknown simulation scheme: {cfg.scheme!r}")
    return table[cfg.scheme](cfg)
