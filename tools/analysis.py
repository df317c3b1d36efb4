"""Analysis utilities: w-k spectra, dump consistency, polar averaging,
magnetic flux tubes.

Counterparts of the reference's tools/plotting/lib/{fourier,
data_consistency, xy_rphi, magnetic_tubes}.py, rebuilt on this package's
``RegionReader`` API and vectorized numpy (the reference's flux-tube
selection is a per-cell double loop; here it is one cumulative sum).
"""

from __future__ import annotations

import os
from typing import Callable

import numpy as np

from .data_format import RegionReader

# -- omega-k spectra (tools/plotting/lib/fourier.py) --------------------------


def wk_spectrum(data: np.ndarray, dt: float, dx: float = None):
    """2-D spectrum of ``data[t, x]`` decomposed by exp(-i w t + i k x).

    Returns (spectrum, w, k) with both axes fft-shifted to be monotonic
    and in angular units.  ``dx`` defaults to a 2 pi / N_x grid (the
    reference's convention for periodic boxes).
    """
    nt, nx = data.shape
    f = np.fft.fftshift(np.fft.fft2(np.fft.ifftshift(data)))
    w = np.fft.fftshift(np.fft.fftfreq(nt, d=dt)) * (2.0 * np.pi)
    if dx is None:
        dx = 2.0 * np.pi / nx
    k = np.fft.fftshift(np.fft.fftfreq(nx, d=dx)) * (2.0 * np.pi)
    return f, w, k


def wk_inverse(spectrum: np.ndarray):
    """Inverse of :func:`wk_spectrum`; returns (real, imag) parts."""
    data = np.fft.fftshift(np.fft.ifft2(np.fft.ifftshift(spectrum)))
    return np.real(data), np.imag(data)


# -- dump consistency (tools/plotting/lib/data_consistency.py) ----------------


def is_correct_timestep(reader: RegionReader, t: int) -> bool:
    """A dump exists and has the full float32 region size."""
    path = reader.filename(t)
    expected = 4 * int(np.prod(reader.size))
    return os.path.isfile(path) and os.path.getsize(path) == expected


def check_consistency(reader: RegionReader, tmin: int, tmax: int) -> int:
    """First inconsistent timestep in [tmin, tmax), or tmax if clean."""
    for t in range(tmin, tmax):
        if not is_correct_timestep(reader, t):
            return t
    return tmax


def find_correct_timestep(reader: RegionReader, t: int, tmin: int = 0) -> int:
    """Latest consistent dump at or before ``t`` (>= tmin); -1 if none."""
    for tc in range(t, tmin - 1, -1):
        if is_correct_timestep(reader, tc):
            return tc
    return -1


# -- polar maps (tools/plotting/lib/xy_rphi.py) --------------------------------


def polar_maps(nx: int, ny: int):
    """Cell-centered (COS, SIN, R) maps around the box axis.

    R is in cell units; COS/SIN are safe at the axis (set to 0 there).
    """
    x = np.arange(nx) - (nx - 1) / 2.0
    y = np.arange(ny) - (ny - 1) / 2.0
    X, Y = np.meshgrid(x, y, indexing="xy")
    R = np.hypot(X, Y)
    safe = R > 1e-12
    COS = np.where(safe, X / np.where(safe, R, 1.0), 0.0)
    SIN = np.where(safe, Y / np.where(safe, R, 1.0), 0.0)
    return COS, SIN, R


def vx_vy_to_vr_va(vx, vy, COS, SIN):
    """Cartesian to cylindrical vector components."""
    return COS * vx + SIN * vy, -SIN * vx + COS * vy


def phi_average(data: np.ndarray, R: np.ndarray, nr: int | None = None):
    """Azimuthal average onto integer radius bins.

    Vectorized: bincount over round(R) instead of the reference's
    per-ring index maps (lib/xy_rphi.py:23-48).
    """
    rr = np.round(R).astype(np.int64).ravel()
    if nr is None:
        nr = int(rr.max()) + 1
    keep = rr < nr
    counts = np.bincount(rr[keep], minlength=nr)
    sums = np.bincount(rr[keep], weights=data.ravel()[keep], minlength=nr)
    return sums / np.maximum(counts, 1)


# -- magnetic flux tubes (tools/plotting/lib/magnetic_tubes.py) -----------------


def select_magnetic_tube(bz: np.ndarray, xl: int) -> np.ndarray:
    """Radius index per z slice enclosing the same magnetic flux as the
    reference radius ``xl`` on the center slice.

    ``bz[z, x]`` is an axial-field slice along a radial line through the
    axis at x = nx//2.  Flux(x) ~ cumulative sum of bz * r; the returned
    xmap[z] is the first x whose enclosed flux reaches the center
    slice's flux through radius xl.  One cumsum + searchsorted per slice
    replaces the reference's per-cell loop (magnetic_tubes.py:7-27).
    """
    zs, xs = bz.shape
    xc = xs // 2
    r = np.arange(xs - xc, dtype=bz.dtype)
    weighted = bz[:, xc:] * r  # [z, radial]
    flux = np.cumsum(weighted, axis=1)
    b_f0 = flux[zs // 2, xl - xc - 1] if xl > xc else 0.0
    xmap = np.empty(zs, dtype=np.int64)
    for z in range(zs):
        idx = np.searchsorted(flux[z], b_f0)
        xmap[z] = xc + min(idx, xs - xc - 1)
    return xmap


def average_over_tube(data: np.ndarray, xmap: np.ndarray, xc: int,
                      dx: float) -> np.ndarray:
    """Area-weighted radial average of ``data[z, x]`` inside the tube
    radius ``xmap[z]`` per slice (magnetic_tubes.py:36-44), symmetrized
    over the +x and -x half-lines."""
    zs = data.shape[0]
    out = np.zeros(zs)
    for z in range(zs):
        n = int(xmap[z] - xc) + 1
        rsv = (np.arange(n)) * dx
        w = 2.0 * np.pi * rsv
        area = np.trapezoid(w, rsv) if n > 1 else 1.0
        right = np.trapezoid(data[z, xc : xc + n] * w, rsv)
        left = np.trapezoid(data[z, xc - n + 1 : xc + 1][::-1] * w, rsv)
        out[z] = 0.5 * (right + left) / area
    return out


def align_with_field(fr, fz, br, bz, b, floor: float = 1e-3):
    """Projection of (fr, fz) onto the unit magnetic direction
    (magnetic_tubes.py:46-49)."""
    dot = fr * br + fz * bz
    return np.divide(dot, b, where=(b > floor), out=np.zeros_like(b))
