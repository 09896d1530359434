"""MatrixMarket file IO: header probe, fast COO read, write.

Reference parity:
* ``read_header``  <- ``mminfo``   (mmio.f:341, used via wrap_mminfo,
  command_argument.f90:89-103) — probes the header without reading values.
* ``read_matrix``  <- ``read_matrix_file`` + ``read_matrix_file_value``
  (matrix_io.f90:22-144) including the index-range validation
  (matrix_io.f90:133-135).  The reference hand-rolled a fast value loop
  because naive formatted reads were too slow; our equivalent fast path is a
  native C++ parser (native/mmio.cpp, loaded via ctypes) with a NumPy
  fallback.
* ``write_matrix`` <- ``mmwrite`` (mmio.f:590).

Only the ``real``/``integer``/``pattern`` fields of ``coordinate``/``array``
representations are supported, matching the reference's real-symmetric scope.
"""

from __future__ import annotations

import io
import time

import numpy as np

from eigenkernel_tpu.core.types import MatrixInfo, SparseMatrix
from eigenkernel_tpu.obs.events import GLOBAL_LOG

_VALID_REPS = ("coordinate", "array")
_VALID_FIELDS = ("real", "integer", "pattern", "double")
_VALID_SYMMS = ("general", "symmetric", "skew-symmetric")


class MatrixMarketError(ValueError):
    pass


def _parse_banner(line: str, filename: str) -> tuple[str, str, str]:
    parts = line.strip().lower().split()
    if len(parts) != 5 or parts[0] != "%%matrixmarket" or parts[1] != "matrix":
        raise MatrixMarketError(f"{filename}: invalid MatrixMarket banner: {line!r}")
    rep, field, symm = parts[2], parts[3], parts[4]
    if rep not in _VALID_REPS:
        raise MatrixMarketError(f"{filename}: unsupported representation {rep!r}")
    if field not in _VALID_FIELDS:
        raise MatrixMarketError(f"{filename}: unsupported field {field!r}")
    if symm not in _VALID_SYMMS:
        raise MatrixMarketError(f"{filename}: unsupported symmetry {symm!r}")
    if field == "double":
        field = "real"
    return rep, field, symm


def read_header(filename: str) -> MatrixInfo:
    """Probe a MatrixMarket header (mminfo analog). Cheap: reads a few lines."""
    with open(filename, "r") as f:
        banner = f.readline()
        rep, field, symm = _parse_banner(banner, filename)
        line = f.readline()
        while line and (line.startswith("%") or not line.strip()):
            line = f.readline()
        if not line:
            raise MatrixMarketError(f"{filename}: missing size line")
        sizes = line.split()
        if rep == "coordinate":
            rows, cols, entries = int(sizes[0]), int(sizes[1]), int(sizes[2])
        else:
            rows, cols = int(sizes[0]), int(sizes[1])
            entries = rows * cols
    return MatrixInfo(rep=rep, field=field, symm=symm, rows=rows, cols=cols,
                      entries=entries)


def read_matrix(filename: str, info: MatrixInfo | None = None,
                log=None) -> SparseMatrix:
    """Read a full MatrixMarket file into a host-side COO ``SparseMatrix``.

    Square symmetric matrices only (the framework's scope).  Indices are
    validated to be in range, mirroring matrix_io.f90:133-135.
    """
    log = log or GLOBAL_LOG
    t0 = time.time()
    info = info or read_header(filename)
    if info.rows != info.cols:
        raise MatrixMarketError(f"{filename}: matrix is not square "
                                f"({info.rows}x{info.cols})")

    mat = _read_native(filename, info)
    if mat is None:
        mat = _read_numpy(filename, info)

    if mat.nnz != info.entries:
        raise MatrixMarketError(
            f"{filename}: expected {info.entries} entries, got {mat.nnz}")
    if mat.nnz and (mat.rows.min() < 0 or mat.rows.max() >= info.rows
                    or mat.cols.min() < 0 or mat.cols.max() >= info.cols):
        raise MatrixMarketError(f"{filename}: index out of range")
    log.add_event("read_matrix_file", time.time() - t0)
    return mat


def _read_native(filename: str, info: MatrixInfo) -> SparseMatrix | None:
    """Fast path: C++ parser (native/mmio.cpp) via ctypes; None if unavailable."""
    if info.rep != "coordinate" or info.field == "pattern":
        return None
    try:
        from eigenkernel_tpu.io import native_mm
        return native_mm.read_coordinate(filename, info)
    except (OSError, ImportError):
        return None


def _read_numpy(filename: str, info: MatrixInfo) -> SparseMatrix:
    with open(filename, "r") as f:
        f.readline()  # banner (already validated by read_header)
        # Skip comments and the size line, keep the rest as one text blob.
        line = f.readline()
        while line and (line.startswith("%") or not line.strip()):
            line = f.readline()
        body = f.read()

    if info.rep == "coordinate":
        if info.field == "pattern":
            data = np.loadtxt(io.StringIO(body), dtype=np.int64, ndmin=2)
            if data.size == 0:
                data = data.reshape(0, 2)
            rows = data[:, 0].astype(np.int64) - 1
            cols = data[:, 1].astype(np.int64) - 1
            vals = np.ones(rows.shape[0], dtype=np.float64)
        else:
            data = np.loadtxt(io.StringIO(body), dtype=np.float64, ndmin=2)
            if data.size == 0:
                data = data.reshape(0, 3)
            rows = data[:, 0].astype(np.int64) - 1
            cols = data[:, 1].astype(np.int64) - 1
            vals = data[:, 2].astype(np.float64)
    else:  # 'array': dense, column-major, full or lower triangle
        vals_all = np.fromiter(body.split(), dtype=np.float64) \
            if body.strip() else np.zeros(0)
        n, m = info.rows, info.cols
        if info.symm == "general":
            if vals_all.size != n * m:
                raise MatrixMarketError(f"{filename}: bad array entry count")
            dense = vals_all.reshape((m, n)).T  # column-major
            rows, cols = np.nonzero(np.ones_like(dense, dtype=bool))
            vals = dense[rows, cols]
        else:
            # lower-triangular packed, column-major
            tri_r, tri_c = np.tril_indices(n)
            order = np.lexsort((tri_r, tri_c))  # column-major packing order
            rows, cols = tri_r[order], tri_c[order]
            if vals_all.size != rows.size:
                raise MatrixMarketError(f"{filename}: bad array entry count")
            vals = vals_all
        info.entries = int(rows.size)

    if info.symm == "skew-symmetric":
        raise MatrixMarketError(f"{filename}: skew-symmetric not supported")
    return SparseMatrix(size=info.rows, rows=rows, cols=cols, values=vals)


def write_matrix(filename: str, mat: SparseMatrix,
                 symm: str = "symmetric") -> None:
    """Write a COO matrix as MatrixMarket coordinate real (mmwrite analog)."""
    with open(filename, "w") as f:
        f.write(f"%%MatrixMarket matrix coordinate real {symm}\n")
        f.write(f"{mat.size} {mat.size} {mat.nnz}\n")
        for i, j, v in zip(mat.rows, mat.cols, mat.values):
            f.write(f"{i + 1} {j + 1} {v:.16e}\n")
