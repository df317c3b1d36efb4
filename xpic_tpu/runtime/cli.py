"""Command-line entry point: ``python -m xpic_tpu config.json``.

Mirrors src/main.cpp:9-40: parse config -> build simulation ->
initialize -> calculate -> finalize, with the dimensionless-units banner
of ``Simulation::log_information`` (src/interfaces/simulation.cpp:114-131).
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import shutil
import sys

log = logging.getLogger("xpic")


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="xpic_tpu", description="TPU-native particle-in-cell framework"
    )
    parser.add_argument("config", help="path to the JSON configuration file")
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument(
        "--trace", metavar="DIR", default=None,
        help="capture a jax.profiler device trace of the main loop into "
             "DIR (viewable with TensorBoard/Perfetto) — the deep-dive "
             "analog of the reference's PETSc log stages "
             "(interfaces/simulation.cpp:83-93)",
    )
    parser.add_argument(
        "--verbose", action="store_true",
        help="debug-level log: per-step migration statistics and the "
             "initial velocity-distribution histograms "
             "(interfaces/particles.cpp:227-246,295-326)",
    )
    parser.add_argument(
        "--set", action="append", default=[], metavar="PATH=JSON",
        help="override a config entry, e.g. --set Geometry.t=30 "
             "--set Simulation='\"ecsim\"' (the runtime-tuning analog of "
             "the reference's PETSc command-line options)",
    )
    args = parser.parse_args(argv)

    logging.basicConfig(
        level=(logging.WARNING if args.quiet
               else logging.DEBUG if args.verbose else logging.INFO),
        format="%(message)s",
    )

    from ..config import Config
    from ..schemes import build_simulation
    from .distributed import maybe_initialize_distributed

    maybe_initialize_distributed()

    with open(args.config) as fh:
        doc = json.load(fh)
    for override in args.set:
        path, _, raw = override.partition("=")
        try:
            value = json.loads(raw)
        except json.JSONDecodeError:
            value = raw
        node = doc
        keys = path.split(".")
        for key in keys[:-1]:
            node = node.setdefault(key, {})
        node[keys[-1]] = value
    cfg = Config.from_json(doc)
    if os.environ.get("XPIC_RNG") == "reference":
        from ..commands.particles_load import use_reference_rng

        use_reference_rng()
        log.info("Using the reference's exact mt19937 random stream")
    os.makedirs(cfg.out_dir, exist_ok=True)
    shutil.copy(args.config, os.path.join(cfg.out_dir, "config.json"))

    g = cfg.geometry
    log.info("Note: Dimensionless units are used.")
    log.info("Geometric constants for the current setup:")
    log.info("  Lx = %.2f [c/w_pe], Nx = %d [dx], dx = %.2f", g.Lx, g.nx, g.dx)
    log.info("  Ly = %.2f [c/w_pe], Ny = %d [dy], dy = %.2f", g.Ly, g.ny, g.dy)
    log.info("  Lz = %.2f [c/w_pe], Nz = %d [dz], dz = %.2f", g.Lz, g.nz, g.dz)
    log.info("  Lt = %.2f [1/w_pe], Nt = %d [dt], dt = %.2f", g.Lt, g.nt, g.dt)

    simulation = build_simulation(cfg)
    try:
        simulation.initialize()
        if args.trace:
            import jax

            with jax.profiler.trace(args.trace):
                simulation.calculate()
            log.info("Device trace written to %s", args.trace)
        else:
            simulation.calculate()
    finally:
        simulation.finalize()
    return 0


if __name__ == "__main__":
    sys.exit(main())
