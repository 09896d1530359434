"""Output writers: eigenvalues.dat, ipratios.dat, eigenvector files, log.json.

Reference parity:

* ``write_eigenvalues``  <- main.f90:111-121 — one ``index value`` line per
  eigenvalue, index 1-based, ~E26.16 float formatting.
* ``write_ipratios``     <- main.f90:131-143 — same shape.
* ``print_eigenvectors`` <- matrix_io.f90:173-285 — one file
  ``<dir>/%08d.dat`` per requested vector; text lines ``i j value`` or
  binary (``--binary``): one Fortran unformatted sequential record
  (``write(nout) work(1:m)``, matrix_io.f90:278) — 4-byte little-endian
  length marker, float64 payload, trailing marker — byte-compatible with
  the reference's gfortran output.
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


def _write_indexed(path: str, values: Sequence[float]) -> None:
    """``index value`` lines; native C++ fast path (Fortran formatted-IO
    analog), Python fallback."""
    from eigenkernel_tpu.io import native_mm

    vals = np.asarray(values, dtype=np.float64)
    if native_mm.write_indexed(path, vals):
        return
    with open(path, "w") as f:
        for j, v in enumerate(vals, start=1):
            f.write(f"{j:8d} {_fmt(float(v))}\n")


def write_eigenvalues(path: str, values: Sequence[float]) -> None:
    _write_indexed(path, values)


def write_ipratios(path: str, ipratios: Sequence[float]) -> None:
    _write_indexed(path, ipratios)


def read_indexed_values(path: str) -> np.ndarray:
    """Read an ``index value`` file (also parses the reference ground-truth
    files matrix/ELSES_MATRIX_*_ev.txt etc.)."""
    data = np.loadtxt(path, ndmin=2)
    return data[:, 1]


def print_eigenvectors(eigenpairs: EigenPairs, out_dir: str,
                       ranges: Iterable[tuple[int, int]],
                       binary: bool = False) -> None:
    """Write eigenvectors for 1-based index ranges, one file per vector.

    Owner-parallel analog of matrix_io.f90:173-230: only the REQUESTED
    columns are fetched from device (O(n * n_requested) transfer, never
    the full O(n^2) block — the device->host link is the bottleneck), and
    under multi-process each vector is written by exactly one process
    (round-robin ownership), all processes writing in parallel.
    """
    os.makedirs(out_dir, exist_ok=True)
    import jax

    nproc = jax.process_count()
    pid = jax.process_index()
    n = eigenpairs.vectors.shape[0]
    for lo, hi in ranges:
        if lo < 1:  # 1-based indices; j=0 would alias the last column
            raise ValueError(f"eigenvector index {lo} is not 1-based")
        # one device slice + transfer per range, not the whole block
        block_dev = eigenpairs.vectors[:, lo - 1:hi]
        if nproc > 1:
            # global (cross-process) arrays are not fully addressable
            from jax.experimental import multihost_utils

            block = np.asarray(multihost_utils.process_allgather(
                block_dev, tiled=True), dtype=np.float64)
        else:
            block = np.asarray(jax.device_get(block_dev), dtype=np.float64)
        for j in range(lo, hi + 1):
            if (j - lo) % nproc != pid:
                continue        # another process owns this vector's file
            col = block[:, j - lo]
            path = os.path.join(out_dir, f"{j:08d}.dat")
            if binary:
                payload = col.astype("<f8").tobytes()
                marker = np.int32(len(payload)).astype("<i4").tobytes()
                with open(path, "wb") as f:
                    f.write(marker + payload + marker)
            else:
                from eigenkernel_tpu.io import native_mm

                if native_mm.write_indexed(path, col, j_col=j):
                    continue
                lines = [f"{i + 1:8d} {j:8d} {_fmt(col[i])}\n"
                         for i in range(n)]
                with open(path, "w") as f:
                    f.writelines(lines)


def write_log_json(path: str, setting: dict, log: EventLog) -> None:
    with open(path, "w") as f:
        json.dump({"setting": setting, "events": log.events()}, f, indent=2)
        f.write("\n")
