"""MatDump: binary dump/compare of the ECSIM mass-matrix blocks.

Counterpart of src/diagnostics/mat_dump.{h,cpp} (standalone in the
reference too).  The block layout [G, 3, 12, 3, 12] plus the static
offset tables (ops/ecsim_blocks.OFFSETS) fully determine the sparse
matrix, so dump/compare operates on the dense block array directly.
"""

from __future__ import annotations

import numpy as np


def dump(path: str, L) -> None:
    np.save(path, np.asarray(L))


def load(path: str) -> np.ndarray:
    return np.load(path)


def compare(path: str, L, rtol: float = 1e-12, atol: float = 1e-12) -> bool:
    ref = load(path)
    cur = np.asarray(L)
    return ref.shape == cur.shape and bool(
        np.allclose(ref, cur, rtol=rtol, atol=atol)
    )
