"""Frame rendering + temporal-table plots.

Counterpart of the reference's tools/plotting/plots/*.py +
basic_run.py: renders one PNG per dump time for a set of panels, in
parallel over timesteps (multiprocessing instead of mpi4py), plus
conserved-quantity plots from the temporal tables.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Sequence

import numpy as np

from .data_format import RegionReader, RunInfo, read_temporal


def _mpl():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


@dataclasses.dataclass
class Panel:
    """One subplot: a field component on a plane with fixed color range.

    Mirrors the reference's gen_plot tuples
    (tools/plotting/plots/basic_fields.py).
    """

    title: str
    reader: RegionReader
    plane: str = "Z"
    comp: int = 0
    vmin: float | None = None
    vmax: float | None = None
    index: int | None = None
    cylindrical: bool = False

    def data(self, t: int) -> np.ndarray:
        if self.cylindrical:
            return self.reader.read_plane_cyl(t, self.comp, self.index)
        return self.reader.read_plane(t, self.plane, self.index, self.comp)


def render_frame(panels: Sequence[Panel], t: int, out_png: str,
                 suptitle: str = "") -> str:
    plt = _mpl()
    n = len(panels)
    ncols = min(3, n)
    nrows = (n + ncols - 1) // ncols
    fig, axes = plt.subplots(nrows, ncols, figsize=(4 * ncols, 3.2 * nrows),
                             squeeze=False)
    for i, p in enumerate(panels):
        ax = axes[i // ncols][i % ncols]
        im = ax.imshow(p.data(t), origin="lower", vmin=p.vmin, vmax=p.vmax,
                       cmap="RdBu_r")
        fig.colorbar(im, ax=ax)
        ax.set_title(p.title)
    for j in range(n, nrows * ncols):
        axes[j // ncols][j % ncols].axis("off")
    if suptitle:
        fig.suptitle(suptitle)
    fig.tight_layout()
    fig.savefig(out_png, dpi=110)
    plt.close(fig)
    return out_png


def process_frames(name: str, panels: Sequence[Panel], run: RunInfo,
                   times: Sequence[int] | None = None,
                   workers: int = 0) -> list[str]:
    """Render every dump time to ``<out>/processed/<name>/<t>.png``.

    ``workers > 0`` fans frames out over processes (the reference runs
    its plot scripts under ``mpiexec -np 4``, basic_run.py:11).
    """
    out_dir = os.path.join(run.out_dir, "processed", name)
    os.makedirs(out_dir, exist_ok=True)
    if times is None:
        times = panels[0].reader.times()
    width = run.time_width()
    jobs = [
        (panels, t, os.path.join(out_dir, f"{t:0{width}d}.png"),
         f"t = {t * run.dt:.3f}")
        for t in times
    ]
    if workers > 0:
        import multiprocessing as mp

        with mp.Pool(workers) as pool:
            return pool.starmap(render_frame, jobs)
    return [render_frame(*j) for j in jobs]


def plot_temporal(run: RunInfo, table: str = "energy_conservation",
                  out_png: str | None = None,
                  columns: Sequence[str] | None = None) -> str:
    """Plot selected columns of a temporal table against time.

    The conserved-props view (reference:
    tools/plotting/plots/conserved_props.py).
    """
    plt = _mpl()
    header, rows = read_temporal(
        os.path.join(run.out_dir, "temporal", table + ".txt")
    )
    t = rows[:, 0] * run.dt
    fig, ax = plt.subplots(figsize=(7, 4))
    for i, col in enumerate(header[1:], start=1):
        if columns and col not in columns:
            continue
        ax.plot(t, rows[:, i], label=col)
    ax.set_xlabel("t")
    ax.legend(fontsize=7)
    ax.set_title(table)
    fig.tight_layout()
    if out_png is None:
        os.makedirs(os.path.join(run.out_dir, "processed"), exist_ok=True)
        out_png = os.path.join(run.out_dir, "processed", table + ".png")
    fig.savefig(out_png, dpi=110)
    plt.close(fig)
    return out_png


def make_movie(run: RunInfo, name: str, fps: int = 15) -> str | None:
    """Assemble ``processed/<name>/*.png`` into ``video/<name>.mp4``
    (reference: tools/plotting/basic_ffmpeg.py).  Returns None when
    ffmpeg is unavailable."""
    import shutil
    import subprocess

    if shutil.which("ffmpeg") is None:
        return None
    video_dir = os.path.join(run.out_dir, "processed", "video")
    os.makedirs(video_dir, exist_ok=True)
    width = run.time_width()
    pattern = os.path.join(run.out_dir, "processed", name, f"%0{width}d.png")
    out = os.path.join(video_dir, f"{name}.mp4")
    subprocess.run(
        ["ffmpeg", "-y", "-i", pattern, "-r", str(fps), out],
        check=True, capture_output=True,
    )
    return out


def plot_conserved_props(run: RunInfo, out_png: str | None = None) -> str:
    """One stacked figure of the conserved properties — electric
    energy, total-energy closure |d(W_E+W_B+K)|, and the charge
    continuity norm — against time, the reference's
    tools/plotting/plots/conserved_props.py view of a finished run."""
    plt = _mpl()
    fig, axes = plt.subplots(3, 1, figsize=(7, 10))

    eh, er = read_temporal(
        os.path.join(run.out_dir, "temporal", "energy.txt"))
    t = er[:, 0] * run.dt
    col = eh.index("dE") if "dE" in eh else 1
    axes[0].plot(t, er[:, col], linewidth=2)
    axes[0].set_title("Electric energy")
    axes[0].set_ylabel(r"$W_E = \sum_g {\bf E}_g^2 / 2$")

    ch, cr = read_temporal(
        os.path.join(run.out_dir, "temporal", "energy_conservation.txt"))
    axes[1].semilogy(cr[:, 0] * run.dt, np.abs(cr[:, -1]) + 1e-300,
                     linewidth=2)
    axes[1].axhline(1e-7, linestyle="--", color="black", linewidth=1)
    axes[1].set_title("Energy conservation")
    axes[1].set_ylabel(r"$|\Delta(W_E + W_B + K)|$")

    try:
        qh, qr = read_temporal(
            os.path.join(run.out_dir, "temporal",
                         "charge_conservation.txt"))
        axes[2].semilogy(qr[:, 0] * run.dt, np.abs(qr[:, -1]) + 1e-300,
                         linewidth=2)
        axes[2].set_title("Charge conservation")
        axes[2].set_ylabel(
            r"$[\sum_g (\Delta\rho_g/\Delta t + {\rm div}\,{\bf J}_g)^2]^{1/2}$")
    except FileNotFoundError:
        axes[2].axis("off")
    axes[2].set_xlabel(r"$\omega_{pe} t$")
    fig.tight_layout()
    if out_png is None:
        os.makedirs(os.path.join(run.out_dir, "processed"), exist_ok=True)
        out_png = os.path.join(run.out_dir, "processed",
                               "conserved_props.png")
    fig.savefig(out_png, dpi=110)
    plt.close(fig)
    return out_png
