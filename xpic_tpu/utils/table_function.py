"""Tabulated 1-D function with linear interpolation from a binary file.

Reference: src/utils/table_function.{h,cpp} — file layout is
(xmin, xmax, dx) float64 header followed by the value array; used by
equilibrium-loading commands.  The evaluation path is vectorized and
jit-safe so tables can feed device-side kernels.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class TableFunction:
    def __init__(self, filename: str | None = None):
        self.xmin = 0.0
        self.xmax = 0.0
        self.dx = 1.0
        self.values = jnp.zeros((1,))
        if filename is not None:
            self.evaluate_from_file(filename)

    def evaluate_from_file(self, filename: str) -> None:
        raw = np.fromfile(filename, dtype=np.float64)
        if raw.size < 4:
            raise ValueError(f"{filename}: too short for a table function")
        self.xmin, self.xmax, self.dx = raw[0], raw[1], raw[2]
        self.values = jnp.asarray(raw[3:])
        n_expected = int(round((self.xmax - self.xmin) / self.dx)) + 1
        if self.values.shape[0] < n_expected:
            raise ValueError(
                f"{filename}: {self.values.shape[0]} values for "
                f"{n_expected} grid points"
            )

    @classmethod
    def from_arrays(cls, xmin: float, dx: float, values) -> "TableFunction":
        tf = cls()
        tf.xmin = float(xmin)
        tf.dx = float(dx)
        tf.values = jnp.asarray(values)
        tf.xmax = tf.xmin + (tf.values.shape[0] - 1) * tf.dx
        return tf

    def save(self, filename: str) -> None:
        header = np.array([self.xmin, self.xmax, self.dx], dtype=np.float64)
        np.concatenate([header, np.asarray(self.values)]).tofile(filename)

    def scale_coordinates(self, scale: float) -> None:
        self.xmin *= scale
        self.xmax *= scale
        self.dx *= scale

    def scale_values(self, scale: float) -> None:
        self.values = self.values * scale

    def get_value(self, x):
        """Linearly interpolated value(s); clamps to the table range
        (matching the reference's edge behavior)."""
        t = (jnp.asarray(x) - self.xmin) / self.dx
        n = self.values.shape[0]
        i0 = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, n - 2)
        frac = jnp.clip(t - i0, 0.0, 1.0)
        return self.values[i0] * (1.0 - frac) + self.values[i0 + 1] * frac
