"""Post-processing readers/plotters for xpic_tpu output.

Counterpart of the reference's tools/plotting package: the binary field
dumps share the same float32 C-ordered (z, y, x, dof) layout
(reference: tools/plotting/lib/data_format.py:34-56), so data written by
either code can be read by either toolchain.

Usage:
    from tools.plotting import FieldReader
    r = FieldReader("results/run/E", size=(nx, ny, nz), dof=3)
    Ez = r.read(t=100)[..., 2]          # [nz, ny, nx]
    r.plot_plane(t=100, comp=2, plane="Z", index=nz // 2)
"""

from __future__ import annotations

import os

import numpy as np


class FieldReader:
    def __init__(self, path: str, size: tuple[int, int, int], dof: int = 3,
                 nt: int | None = None):
        self.path = path
        self.size = size  # (nx, ny, nz)
        self.dof = dof
        if nt is None:
            names = [n for n in os.listdir(path) if n.isdigit()]
            self.width = max((len(n) for n in names), default=1)
        else:
            self.width = len(str(nt))

    def filename(self, t: int) -> str:
        return os.path.join(self.path, f"{t:0{self.width}d}")

    def times(self) -> list[int]:
        return sorted(
            int(n) for n in os.listdir(self.path) if n.isdigit()
        )

    def read(self, t: int) -> np.ndarray:
        """Return [nz, ny, nx, dof] float32."""
        nx, ny, nz = self.size
        data = np.fromfile(self.filename(t), dtype=np.float32)
        return data.reshape(nz, ny, nx, self.dof)

    def read_plane(self, t: int, plane: str = "Z", index: int = 0,
                   comp: int = 0) -> np.ndarray:
        data = self.read(t)[..., comp]
        axis = {"Z": 0, "Y": 1, "X": 2}[plane.upper()]
        return np.take(data, index, axis=axis)

    def plot_plane(self, t: int, plane: str = "Z", index: int = 0,
                   comp: int = 0, out: str | None = None, **imshow_kw):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        sl = self.read_plane(t, plane, index, comp)
        fig, ax = plt.subplots()
        im = ax.imshow(sl, origin="lower", **imshow_kw)
        fig.colorbar(im, ax=ax)
        ax.set_title(f"{os.path.basename(self.path)}[{comp}] "
                     f"{plane}={index} t={t}")
        if out is None:
            out = f"{self.path}_{plane}{index}_c{comp}_{t}.png"
        fig.savefig(out, dpi=120)
        plt.close(fig)
        return out


def read_temporal(path: str):
    """Read a temporal/*.txt table -> (header list, [rows, cols] array)."""
    with open(path) as fh:
        header = fh.readline().split()
        rows = np.loadtxt(fh)
    if rows.ndim == 1:
        rows = rows[None, :]
    return header, rows
