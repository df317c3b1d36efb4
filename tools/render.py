"""Batch render driver: every standard plot set + movie per set.

Counterpart of the reference's ``tools/plotting/basic_run.py`` (which
runs each plot script under ``mpiexec -np 4``) and ``basic_ffmpeg.py``
(which assembles ``video/<set>.mp4`` from the rendered frames): one
config-driven entry point discovers which dump series a finished run
produced (``Diagnostics`` in the saved config), renders a frame per
dump time for each set in a process pool, and assembles one movie per
set.

Movie assembly uses ffmpeg when present; otherwise a built-in
pure-Python MJPEG/AVI muxer (PIL re-encodes the PNG frames to JPEG and
the RIFF container is written directly), so a finished run always
yields a playable movie in this environment.

Usage:
    python -m tools.render <out_dir>/config.json [--workers N] [sets...]
"""

from __future__ import annotations

import os
import shutil
import struct
import subprocess
import sys
from typing import Sequence

from .data_format import RegionReader, RunInfo
from .plots import Panel, plot_conserved_props, plot_temporal, process_frames


def write_mjpeg_avi(frames: Sequence[str], out_path: str,
                    fps: int = 15) -> str:
    """Mux image frames into an MJPEG AVI (RIFF) without ffmpeg.

    Every mainstream player (ffmpeg, VLC, mpv, browsers via
    transcoding) decodes MJPG AVIs; the container is simple enough to
    write by hand: RIFF('AVI ') { LIST hdrl { avih, LIST strl { strh,
    strf } }, LIST movi { 00dc... }, idx1 }.
    """
    from io import BytesIO

    from PIL import Image

    jpegs = []
    width = height = None
    for f in frames:
        with Image.open(f) as im:
            im = im.convert("RGB")
            if width is None:
                width, height = im.size
            elif im.size != (width, height):
                im = im.resize((width, height))
            buf = BytesIO()
            im.save(buf, "JPEG", quality=90)
            data = buf.getvalue()
        if len(data) % 2:
            data += b"\0"
        jpegs.append(data)
    if not jpegs:
        raise ValueError("no frames to mux")

    n = len(jpegs)
    max_size = max(len(j) for j in jpegs)

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\0" if len(payload) % 2 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(fourcc: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", fourcc + payload)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        int(1e6 / fps),          # microseconds per frame
        max_size * fps,          # max bytes per second
        0,                       # padding granularity
        0x10,                    # AVIF_HASINDEX
        n, 0, 1, max_size,       # total frames, initial, streams, buf
        width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n,
                      max_size, 0xFFFFFFFF, 0)
        + struct.pack("<HHHH", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG", width * height * 3,
        0, 0, 0, 0,
    )
    hdrl = lst(b"hdrl",
               chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))

    movi_payload = b"".join(chunk(b"00dc", j) for j in jpegs)
    movi = lst(b"movi", movi_payload)

    idx = b""
    offset = 4  # relative to the start of the movi LIST payload
    for j in jpegs:
        size = len(j)
        idx += b"00dc" + struct.pack("<III", 0x10, offset, size)
        offset += 8 + size + (size % 2)
    idx1 = chunk(b"idx1", idx)

    body = b"AVI " + hdrl + movi + idx1
    with open(out_path, "wb") as fh:
        fh.write(b"RIFF" + struct.pack("<I", len(body)) + body)
    return out_path


def assemble_movie(run: RunInfo, name: str, fps: int = 15) -> str:
    """``processed/<name>/*.png`` -> ``processed/video/<name>.{mp4,avi}``
    (reference: basic_ffmpeg.py); falls back to the built-in MJPEG
    muxer when ffmpeg is absent."""
    frame_dir = os.path.join(run.out_dir, "processed", name)
    video_dir = os.path.join(run.out_dir, "processed", "video")
    os.makedirs(video_dir, exist_ok=True)
    width = run.time_width()
    if shutil.which("ffmpeg"):
        out = os.path.join(video_dir, f"{name}.mp4")
        subprocess.run(
            ["ffmpeg", "-y", "-i",
             os.path.join(frame_dir, f"%0{width}d.png"),
             "-r", str(fps), out],
            check=True, capture_output=True,
        )
        return out
    frames = sorted(
        os.path.join(frame_dir, f) for f in os.listdir(frame_dir)
        if f.endswith(".png")
    )
    return write_mjpeg_avi(frames, os.path.join(video_dir, f"{name}.avi"),
                           fps)


# dof per moment — mirrors diagnostics/distribution_moment.MOMENT_DOF
# (kept literal here so the toolchain needs no jax import).
_MOMENT_DOF = {
    "density": 1,
    "current": 3,
    "momentum_flux": 6,
    "momentum_flux_cyl": 6,
    "momentum_flux_diag": 3,
    "momentum_flux_diag_cyl": 3,
}
# Component labels per moment kind (reference panel titles,
# tools/plotting/plots/{currents,pressures}.py).
_FLUX_LABELS = {
    "momentum_flux": ("\\Pi_{xx}", "\\Pi_{xy}", "\\Pi_{xz}",
                      "\\Pi_{yy}", "\\Pi_{yz}", "\\Pi_{zz}"),
    "momentum_flux_cyl": ("\\Pi_{rr}", "\\Pi_{r\\phi}", "\\Pi_{rz}",
                          "\\Pi_{\\phi\\phi}", "\\Pi_{\\phi z}",
                          "\\Pi_{zz}"),
    "momentum_flux_diag": ("\\Pi_{xx}", "\\Pi_{yy}", "\\Pi_{zz}"),
    "momentum_flux_diag_cyl": ("\\Pi_{rr}", "\\Pi_{\\phi\\phi}",
                               "\\Pi_{zz}"),
}


def _moment_reader(run: RunInfo, diag: dict) -> RegionReader | None:
    """Reader for one DistributionMoment series, with the grid shape
    taken from the diagnostic's region when present (a region'd moment
    writes region-sized binaries — advisor r4 finding)."""
    species = diag["particles"]
    moment = diag["moment"]
    suffix = diag.get("region", {}).get("suffix", "")
    path = os.path.join(run.out_dir, species, moment + suffix)
    if not os.path.isdir(path):
        return None
    nx, ny, nz = run.nx, run.ny, run.nz
    reg = diag.get("region", {})
    if "size" in reg:
        steps = (run.dx, run.dy, run.dz)
        nx, ny, nz = (
            int(float(str(v).split()[0]) // s) if isinstance(v, str)
            else int(v // s)
            for v, s in zip(reg["size"], steps)
        )
    dof = _MOMENT_DOF.get(moment, 1)
    return RegionReader(path, (nx, ny, nz, dof), nt=run.nt)


def discover_sets(run: RunInfo) -> dict[str, list[Panel]]:
    """Plot sets from the run's own Diagnostics section (the reference
    hand-lists these in tools/plotting/plots/*.py; here they are
    derived from the saved config):

    * ``fields``                 — E/B/J components (fields.py);
    * ``currents_<species>``     — per-species current moment components
                                   (currents.py);
    * ``pressures_<species>``    — momentum-flux moment panels
                                   (pressures.py);
    * ``info_<species>``         — density and other scalar moments;
    * ``distribution_<species>`` — f(v1, v2) velocity maps
                                   (distribution.py).
    """
    sets: dict[str, list[Panel]] = {}
    for diag in run.config.get("Diagnostics", ()):
        kind = diag.get("diagnostic")
        if kind == "FieldView":
            field = diag["field"]
            suffix = diag.get("region", {}).get("suffix", "")
            try:
                reader = RegionReader.from_config(run, field, suffix)
            except Exception:
                continue
            panels = sets.setdefault("fields", [])
            tag = f"^{{{suffix}}}" if suffix else ""
            for c in range(min(reader.size[3], 3)):
                panels.append(
                    Panel(f"${field}_{'xyz'[c]}{tag}$", reader, "Z", c))
        elif kind == "DistributionMoment":
            species = diag["particles"]
            moment = diag["moment"]
            reader = _moment_reader(run, diag)
            if reader is None:
                continue
            s = species[0]
            if moment == "current":
                panels = sets.setdefault(f"currents_{species}", [])
                for c in range(3):
                    panels.append(Panel(
                        f"$J^{s}_{'xyz'[c]}$", reader, "Z", c,
                        cylindrical=moment.endswith("cyl")))
            elif moment in _FLUX_LABELS:
                panels = sets.setdefault(f"pressures_{species}", [])
                for c, lab in enumerate(_FLUX_LABELS[moment]):
                    panels.append(Panel(f"${lab}^{s}$", reader, "Z", c))
            else:
                sets.setdefault(f"info_{species}", []).append(
                    Panel(f"{species} {moment}", reader, "Z", 0))
        elif kind == "VelocityDistribution":
            species = diag["particles"]
            projection = diag.get("projection", "vx_vy")
            path = os.path.join(run.out_dir, species, projection)
            if not os.path.isdir(path):
                continue
            v1, v2 = projection.split("_", 1)
            vmin = diag.get("vmin", (-1.0, -1.0))
            vmax = diag.get("vmax", (+1.0, +1.0))
            dv = diag.get("dv", (0.01, 0.01))

            def _num(x):
                return float(str(x).split()[0])

            nv = tuple(
                max(1, int(round((_num(vmax[i]) - _num(vmin[i]))
                                 / _num(dv[i]))))
                for i in range(2)
            )
            reader = RegionReader(path, (nv[0], nv[1], 1, 1), nt=run.nt)
            sets.setdefault(f"distribution_{species}", []).append(
                Panel(f"$f({v1}, {v2})$ {species}", reader, "Z", 0))
    return sets


def render_all(run: RunInfo, workers: int = 0, fps: int = 15,
               only: Sequence[str] | None = None) -> dict[str, str]:
    """Render every discovered plot set + temporal plots + movies.
    Returns {set name: movie path}."""
    movies: dict[str, str] = {}
    for name, panels in discover_sets(run).items():
        if only and name not in only:
            continue
        frames = process_frames(name, panels, run, workers=workers)
        if frames:
            movies[name] = assemble_movie(run, name, fps=fps)
    for table in ("energy", "energy_conservation", "charge_conservation",
                  "momentum_conservation"):
        try:
            plot_temporal(run, table)
        except FileNotFoundError:
            pass
    try:
        plot_conserved_props(run)
    except FileNotFoundError:
        pass
    return movies


def main(argv: list[str]) -> int:
    if not argv:
        print(__doc__)
        return 1
    workers = 0
    if "--workers" in argv:
        i = argv.index("--workers")
        workers = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    run = RunInfo.load(argv[0])
    movies = render_all(run, workers=workers, only=argv[1:] or None)
    for name, path in movies.items():
        print(f"{name}: {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
