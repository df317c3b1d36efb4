"""Post-processing toolchain: readers + frame rendering round-trip.

Mirrors the reference's I/O contract checks
(tests/diagnostics/field_view.cpp:14-45): dump a known field through
FieldView, read it back through tools.data_format, render a frame.
"""

import json
import os

import numpy as np
import pytest


def _run_small(tmp_path, extra_diags=()):
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
        "Diagnostics": [{"diagnostic": "FieldView", "field": "E"}]
        + list(extra_diags),
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


# -- analysis utilities (tools/analysis.py) ----------------------------------


def test_wk_spectrum_plane_wave():
    """A pure exp(-i w0 t + i k0 x) wave peaks at (w0, k0) and inverts."""
    from tools.analysis import wk_inverse, wk_spectrum

    nt, nx, dt = 64, 32, 0.5
    t = np.arange(nt) * dt
    x = np.arange(nx) * (2 * np.pi / nx)
    w0 = 2 * np.pi * 4 / (nt * dt)  # 4th temporal mode
    k0 = 3.0  # 3rd spatial mode
    data = np.cos(k0 * x[None, :] - w0 * t[:, None])

    f, w, k = wk_spectrum(data, dt)
    mag = np.abs(f)
    iw, ik = np.unravel_index(np.argmax(mag), mag.shape)
    # cos splits into (+w0,+k0) and (-w0,-k0).
    assert abs(abs(w[iw]) - w0) < 2 * np.pi / (nt * dt) * 0.51
    assert abs(abs(k[ik]) - k0) < 0.51

    real, imag = wk_inverse(f)
    np.testing.assert_allclose(real, data, atol=1e-12)
    np.testing.assert_allclose(imag, 0.0, atol=1e-12)


def test_dump_consistency(tmp_path):
    from tools.analysis import (check_consistency, find_correct_timestep,
                                is_correct_timestep)
    from tools.data_format import RegionReader

    d = tmp_path / "E"
    d.mkdir()
    size = (4, 4, 4, 3)
    good = np.zeros(size[::-1], dtype=np.float32)
    for t in (0, 1, 2, 4):
        good.tofile(str(d / f"{t:02d}"))
    np.zeros(5, dtype=np.float32).tofile(str(d / "03"))  # truncated dump

    reader = RegionReader(str(d), size, nt=10)
    assert is_correct_timestep(reader, 2)
    assert not is_correct_timestep(reader, 3)
    assert check_consistency(reader, 0, 5) == 3
    assert find_correct_timestep(reader, 3) == 2
    assert find_correct_timestep(reader, 4) == 4


def test_phi_average_radial_function():
    from tools.analysis import phi_average, polar_maps, vx_vy_to_vr_va

    COS, SIN, R = polar_maps(33, 33)
    prof = phi_average(R, R, nr=12)  # phi-average of r is r itself
    np.testing.assert_allclose(prof[1:], np.arange(1, 12), atol=0.5)

    # A purely radial vector field maps onto (vr, 0).
    vx, vy = COS * 2.5, SIN * 2.5
    vr, va = vx_vy_to_vr_va(vx, vy, COS, SIN)
    np.testing.assert_allclose(vr[R > 0.5], 2.5, atol=1e-12)
    np.testing.assert_allclose(va, 0.0, atol=1e-12)


def test_magnetic_tube_uniform_field():
    """In a uniform Bz the constant-flux tube has constant radius, and
    the tube average of a uniform quantity is that quantity."""
    from tools.analysis import average_over_tube, select_magnetic_tube

    zs, xs = 16, 33
    xc = xs // 2
    bz = np.ones((zs, xs))
    xl = xc + 8
    xmap = select_magnetic_tube(bz, xl)
    np.testing.assert_allclose(xmap, xl - 1, atol=1)

    data = np.full((zs, xs), 7.0)
    avg = average_over_tube(data, xmap, xc, dx=0.5)
    np.testing.assert_allclose(avg, 7.0, rtol=1e-12)


def test_render_pipeline_smoke(tmp_path):
    """The batch render driver (reference basic_run.py + basic_ffmpeg.py
    analog): a finished 2-dump run yields one frame per dump per set and
    a playable movie per set — via ffmpeg when available, otherwise the
    built-in MJPEG/AVI muxer."""
    from tools.data_format import RunInfo
    from tools.render import render_all

    doc, cfg = _run_small(tmp_path, extra_diags=[
        {"diagnostic": "DistributionMoment", "particles": "electrons",
         "moment": "density"},
        {"diagnostic": "DistributionMoment", "particles": "electrons",
         "moment": "current"},
        {"diagnostic": "DistributionMoment", "particles": "electrons",
         "moment": "momentum_flux_diag"},
        {"diagnostic": "VelocityDistribution", "particles": "electrons",
         "projection": "vx_vy",
         "vmin": [-0.5, -0.5], "vmax": [0.5, 0.5], "dv": [0.05, 0.05]},
    ])
    run = RunInfo.load(os.path.join(cfg.out_dir, "config.json"))
    movies = render_all(run, workers=2)

    assert set(movies) == {"fields", "info_electrons",
                           "currents_electrons", "pressures_electrons",
                           "distribution_electrons"}
    for name, path in movies.items():
        frames = sorted(os.listdir(
            os.path.join(cfg.out_dir, "processed", name)))
        n_dumps = len(list(run.times()))
        assert len(frames) == n_dumps >= 2
        assert os.path.getsize(path) > 1000
        with open(path, "rb") as fh:
            head = fh.read(12)
        assert head[:4] == b"RIFF" and head[8:12] == b"AVI " or \
            path.endswith(".mp4")
    # temporal plots + the conserved-props figure were produced alongside
    assert os.path.exists(os.path.join(cfg.out_dir, "processed",
                                       "energy_conservation.png"))
    assert os.path.exists(os.path.join(cfg.out_dir, "processed",
                                       "conserved_props.png"))
