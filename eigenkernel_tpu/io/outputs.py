"""Output writers: eigenvalues.dat, ipratios.dat, eigenvector files, log.json.

Reference parity:

* ``write_eigenvalues``  <- main.f90:111-121 — one ``index value`` line per
  eigenvalue, index 1-based, ~E26.16 float formatting.
* ``write_ipratios``     <- main.f90:131-143 — same shape.
* ``print_eigenvectors`` <- matrix_io.f90:173-285 — one file
  ``<dir>/%08d.dat`` per requested vector; text lines ``i j value`` or raw
  binary (``--binary``; we write a flat float64 little-endian vector instead
  of Fortran unformatted records).
* ``write_log_json``     <- main.f90:185-190 — ``{"setting": {...},
  "events": [{name, num_repeated, val}, ...]}``, the exact fson schema.
"""

from __future__ import annotations

import json
import os
from typing import Iterable, Sequence

import numpy as np

from eigenkernel_tpu.core.types import EigenPairs
from eigenkernel_tpu.obs.events import EventLog


def _fmt(value: float) -> str:
    return f"{value:26.16E}"


def write_eigenvalues(path: str, values: Sequence[float]) -> None:
    with open(path, "w") as f:
        for j, v in enumerate(values, start=1):
            f.write(f"{j:8d} {_fmt(float(v))}\n")


def write_ipratios(path: str, ipratios: Sequence[float]) -> None:
    with open(path, "w") as f:
        for j, v in enumerate(ipratios, start=1):
            f.write(f"{j:8d} {_fmt(float(v))}\n")


def read_indexed_values(path: str) -> np.ndarray:
    """Read an ``index value`` file (also parses the reference ground-truth
    files matrix/ELSES_MATRIX_*_ev.txt etc.)."""
    data = np.loadtxt(path, ndmin=2)
    return data[:, 1]


def print_eigenvectors(eigenpairs: EigenPairs, out_dir: str,
                       ranges: Iterable[tuple[int, int]],
                       binary: bool = False) -> None:
    """Write eigenvectors for 1-based index ranges, one file per vector."""
    import jax

    vecs = np.asarray(jax.device_get(eigenpairs.vectors))
    n = vecs.shape[0]
    for lo, hi in ranges:
        for j in range(lo, hi + 1):
            if j < 1:  # 1-based indices; j=0 would alias the last column
                raise ValueError(f"eigenvector index {j} is not 1-based")
            col = vecs[:, j - 1].astype(np.float64)
            path = os.path.join(out_dir, f"{j:08d}.dat")
            if binary:
                col.tofile(path)
            else:
                with open(path, "w") as f:
                    for i in range(n):
                        f.write(f"{i + 1:8d} {j:8d} {_fmt(col[i])}\n")


def write_log_json(path: str, setting: dict, log: EventLog) -> None:
    with open(path, "w") as f:
        json.dump({"setting": setting, "events": log.events()}, f, indent=2)
        f.write("\n")
