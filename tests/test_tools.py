"""Post-processing toolchain: readers + frame rendering round-trip.

Mirrors the reference's I/O contract checks
(tests/diagnostics/field_view.cpp:14-45): dump a known field through
FieldView, read it back through tools.data_format, render a frame.
"""

import json
import os

import numpy as np
import pytest


def _run_small(tmp_path):
    from xpic_tpu.config import Config
    from xpic_tpu.schemes import build_simulation

    doc = {
        "Simulation": "basic",
        "OutputDirectory": str(tmp_path / "out"),
        "Geometry": {
            "x": 3.0, "y": 3.0, "z": 3.0, "t": 0.2,
            "dx": 0.5, "dy": 0.5, "dz": 0.5, "dt": 0.1,
            "diagnose_period": "1 [dt]",
        },
        "Particles": [
            {"sort_name": "electrons", "Np": 4, "n": 1.0, "q": -1.0,
             "m": 1.0, "T": 0.1}
        ],
        "Presets": [
            {"command": "SetParticles", "particles": "electrons",
             "coordinate": {"name": "CoordinateInBox"},
             "momentum": {"name": "MaxwellianMomentum", "tov": True}}
        ],
        "Diagnostics": [{"diagnostic": "FieldView", "field": "E"}],
    }
    cfg = Config.from_json(doc)
    with open(tmp_path / "config.json", "w") as fh:
        json.dump(doc, fh)
    sim = build_simulation(cfg)
    sim.initialize()
    sim.calculate()
    sim.finalize()
    # the CLI copies the config into the out dir; emulate that here
    with open(os.path.join(cfg.out_dir, "config.json"), "w") as fh:
        json.dump(doc, fh)
    return doc, cfg


def test_region_reader_roundtrip(tmp_path):
    from tools.data_format import RegionReader, RunInfo

    doc, cfg = _run_small(tmp_path)
    run = RunInfo.load(os.path.join(cfg.out_dir, "config.json"))
    assert run.nx == run.ny == run.nz == 6
    r = RegionReader.from_config(run, "E")
    times = r.times()
    assert times[0] == 0 and len(times) >= 2
    data = r.read(times[-1])
    assert data.shape == (6, 6, 6, 3)
    assert data.dtype == np.float32
    plane = r.read_plane(times[-1], "Z", comp=1)
    assert plane.shape == (6, 6)
    # file size contract: float32 * region volume (field_view.cpp:39-43)
    fname = r.filename(times[-1])
    assert os.path.getsize(fname) == 6 * 6 * 6 * 3 * 4


def test_frame_and_temporal_plots(tmp_path):
    pytest.importorskip("matplotlib")
    from tools.data_format import RegionReader, RunInfo
    from tools.plots import Panel, plot_temporal, process_frames

    doc, cfg = _run_small(tmp_path)
    run = RunInfo.load(os.path.join(cfg.out_dir, "config.json"))
    reader = RegionReader.from_config(run, "E")
    panels = [Panel(f"E_{c}", reader, "Z", i) for i, c in enumerate("xyz")]
    frames = process_frames("fields", panels, run)
    assert all(os.path.exists(f) for f in frames)
    png = plot_temporal(run, "energy_conservation")
    assert os.path.exists(png)
