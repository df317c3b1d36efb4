"""CLI: render field frames / temporal plots for a finished run.

Usage:
    python -m tools <config.json> render            # every set + movies
    python -m tools <config.json> fields E B        # frame per dump time
    python -m tools <config.json> temporal          # conserved-props plots
    python -m tools <config.json> movie fields      # movie assembly
"""

from __future__ import annotations

import sys

from .data_format import RegionReader, RunInfo
from .plots import Panel, make_movie, plot_temporal, process_frames


def main(argv: list[str]) -> int:
    if len(argv) < 2:
        print(__doc__)
        return 1
    run = RunInfo.load(argv[0])
    mode = argv[1]
    if mode == "fields":
        fields = argv[2:] or ["E", "B"]
        panels = []
        for f in fields:
            reader = RegionReader.from_config(run, f)
            for c, cname in enumerate("xyz"):
                panels.append(Panel(f"${f}_{cname}$", reader, "Z", c))
        out = process_frames("fields", panels, run)
        print(f"{len(out)} frames -> {out[-1] if out else '(none)'}")
    elif mode == "temporal":
        for table in ("energy", "energy_conservation", "charge_conservation",
                      "momentum_conservation"):
            try:
                print(plot_temporal(run, table))
            except FileNotFoundError:
                pass
    elif mode == "movie":
        name = argv[2] if len(argv) > 2 else "fields"
        out = make_movie(run, name)
        if out is None:  # no ffmpeg: built-in MJPEG muxer
            from .render import assemble_movie

            out = assemble_movie(run, name)
        print(out)
    elif mode == "render":
        # the batch driver: every discovered set + movies + temporal
        # plots (reference: basic_run.py + basic_ffmpeg.py)
        from .render import render_all

        for name, path in render_all(run, workers=4).items():
            print(f"{name}: {path}")
    else:
        print(__doc__)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
