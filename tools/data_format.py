"""Binary-output readers driven by the run's config.json.

Counterpart of the reference's tools/plotting/lib/data_format.py +
tools/configuration.py: the float32 C-ordered (z, y, x, dof) layout is
shared, so either toolchain can read either code's dumps.  Instead of a
hand-maintained Region, readers here introspect the saved config
(``<out>/config.json``, written by the runtime at startup) and derive
region extents/paths from the same ``Diagnostics`` entries that produced
the files.
"""

from __future__ import annotations

import dataclasses
import json
import os

import numpy as np

PLANE_AXIS = {"Z": 0, "Y": 1, "X": 2}  # data is [nz, ny, nx, dof]


@dataclasses.dataclass
class RunInfo:
    """Parsed run metadata (the reference's tools/configuration.py role)."""

    config: dict
    out_dir: str
    nx: int
    ny: int
    nz: int
    nt: int
    dx: float
    dy: float
    dz: float
    dt: float
    diagnose_period: int

    @classmethod
    def load(cls, config_path: str) -> "RunInfo":
        with open(config_path) as fh:
            doc = json.load(fh)
        import sys

        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        from xpic_tpu.config import geometry_from_json

        geom = geometry_from_json(doc["Geometry"])
        return cls(
            config=doc,
            out_dir=doc.get("OutputDirectory", "."),
            nx=geom.nx, ny=geom.ny, nz=geom.nz, nt=geom.nt,
            dx=geom.dx, dy=geom.dy, dz=geom.dz, dt=geom.dt,
            diagnose_period=geom.diagnose_period,
        )

    def sort(self, name: str) -> dict | None:
        for s in self.config.get("Particles", ()):
            if s.get("sort_name") == name:
                return s
        return None

    def time_width(self) -> int:
        return len(str(self.nt))

    def times(self) -> range:
        return range(0, self.nt + 1, self.diagnose_period)


class RegionReader:
    """Read a FieldView/DistributionMoment region dump directory.

    ``size`` is (nx, ny, nz, dof); files are float32 C-ordered
    (z, y, x, dof), named by zero-padded timestep.
    """

    def __init__(self, path: str, size: tuple[int, int, int, int],
                 nt: int | None = None):
        self.path = path
        self.size = tuple(size)
        if nt is None:
            names = [n for n in os.listdir(path) if n.isdigit()]
            self.width = max((len(n) for n in names), default=1)
        else:
            self.width = len(str(nt))

    @classmethod
    def from_config(cls, run: RunInfo, field: str, suffix: str = "") -> "RegionReader":
        """Build the reader for a ``FieldView``/``DistributionMoment``
        diagnostic found in the config (matched by field name + region
        suffix, mirroring the output-directory naming rule)."""
        name = field + ("_" + suffix if suffix else "")
        dof = 3
        nx, ny, nz = run.nx, run.ny, run.nz
        for d in run.config.get("Diagnostics", ()):
            dfield = d.get("field", d.get("moment", ""))
            dsuffix = d.get("region", {}).get("suffix", "")
            if dfield == field and dsuffix == suffix:
                reg = d.get("region", {})
                if "size" in reg:
                    steps = (run.dx, run.dy, run.dz)
                    sz = [int(float(str(v).split()[0]) // s) if isinstance(v, str)
                          else int(v // s)
                          for v, s in zip(reg["size"], steps)]
                    nx, ny, nz = sz
                if d.get("diagnostic") == "DistributionMoment":
                    m = d.get("moment", "density")
                    dof = 1 if m in ("density",) else 3
                break
        return cls(os.path.join(run.out_dir, name), (nx, ny, nz, dof),
                   nt=run.nt)

    def filename(self, t: int) -> str:
        return os.path.join(self.path, f"{t:0{self.width}d}")

    def times(self) -> list[int]:
        return sorted(int(n) for n in os.listdir(self.path) if n.isdigit())

    def read(self, t: int) -> np.ndarray:
        """[nz, ny, nx, dof] float32."""
        nx, ny, nz, dof = self.size
        data = np.fromfile(self.filename(t), dtype=np.float32)
        return data.reshape(nz, ny, nx, dof)

    def read_plane(self, t: int, plane: str = "Z", index: int | None = None,
                   comp: int = 0) -> np.ndarray:
        """One 2-D slice of component ``comp`` (mid-plane by default)."""
        data = self.read(t)[..., comp]
        axis = PLANE_AXIS[plane.upper()]
        if index is None:
            index = data.shape[axis] // 2
        return np.take(data, index, axis=axis)

    # -- cylindrical component remap (reference: data_format.py:78-101,
    #    lib/xy_rphi.py) ------------------------------------------------
    def _cos_sin(self):
        nx, ny = self.size[0], self.size[1]
        x = np.arange(nx) - (nx - 1) / 2.0
        y = np.arange(ny) - (ny - 1) / 2.0
        X, Y = np.meshgrid(x, y)  # [ny, nx]
        rho = np.hypot(X, Y)
        rho[rho == 0] = 1.0
        return X / rho, Y / rho

    def read_plane_cyl(self, t: int, comp: int,
                       index: int | None = None) -> np.ndarray:
        """(vr, vphi) remap of an in-plane vector on a Z-plane:
        vr = vx cos + vy sin; vphi = -vx sin + vy cos."""
        fx = self.read_plane(t, "Z", index, 0)
        fy = self.read_plane(t, "Z", index, 1)
        cos, sin = self._cos_sin()
        if comp == 0:
            return fx * cos + fy * sin
        return -fx * sin + fy * cos


class DistributionReader:
    """Read VelocityDistribution 2-D histograms (float32 [nv2, nv1])."""

    def __init__(self, path: str, shape: tuple[int, int],
                 nt: int | None = None):
        self.path = path
        self.shape = tuple(shape)
        if nt is None:
            names = [n for n in os.listdir(path) if n.isdigit()]
            self.width = max((len(n) for n in names), default=1)
        else:
            self.width = len(str(nt))

    def read(self, t: int) -> np.ndarray:
        data = np.fromfile(
            os.path.join(self.path, f"{t:0{self.width}d}"), dtype=np.float32
        )
        return data.reshape(self.shape)


def read_temporal(path: str):
    """Read a temporal/*.txt column table -> (header list, [rows, cols])."""
    with open(path) as fh:
        header = fh.readline().split()
        rows = np.loadtxt(fh)
    if rows.ndim == 1:
        rows = rows[None, :]
    return header, rows
