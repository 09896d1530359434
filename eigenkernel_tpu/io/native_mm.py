"""ctypes binding to the native C++ MatrixMarket parser (native/mmio.cpp).

Looked up in ``eigenkernel_tpu/_native/libekmm.so``; if absent, a one-shot
build with ``g++`` is attempted and cached.  Callers treat any failure here
as "no fast path" and fall back to the NumPy parser.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from eigenkernel_tpu.core.types import MatrixInfo, SparseMatrix

_PKG_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_NATIVE_DIR = os.path.join(_PKG_DIR, "_native")
# versioned name: dlopen caches by path within a process, so ABI additions
# must change the filename
_LIB_PATH = os.path.join(_NATIVE_DIR, "libekmm_v2.so")
_SRC_PATH = os.path.join(os.path.dirname(_PKG_DIR), "native", "mmio.cpp")

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_failed = False


def _load() -> ctypes.CDLL:
    global _lib, _failed
    with _lock:
        if _lib is not None:
            return _lib
        if _failed:
            raise OSError("native mmio unavailable")
        if not os.path.exists(_LIB_PATH):
            _build()
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _failed = True
            raise
        lib.ekmm_read_coordinate.restype = ctypes.c_int64
        lib.ekmm_read_coordinate.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.ekmm_write_indexed.restype = ctypes.c_int64
        lib.ekmm_write_indexed.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double),
        ]
        _lib = lib
        return lib


def _build() -> None:
    global _failed
    if not os.path.exists(_SRC_PATH):
        _failed = True
        raise OSError("native mmio source missing")
    os.makedirs(_NATIVE_DIR, exist_ok=True)
    try:
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-shared", "-std=c++17",
             "-o", _LIB_PATH, _SRC_PATH],
            check=True, capture_output=True, timeout=120,
        )
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        _failed = True
        raise OSError(f"native mmio build failed: {e}") from e


def read_coordinate(filename: str, info: MatrixInfo) -> SparseMatrix:
    lib = _load()
    nnz = info.entries
    rows = np.empty(nnz, dtype=np.int64)
    cols = np.empty(nnz, dtype=np.int64)
    vals = np.empty(nnz, dtype=np.float64)
    got = lib.ekmm_read_coordinate(
        filename.encode(),
        nnz,
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        cols.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        vals.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if got < 0:
        raise OSError(f"native mmio parse error {got} for {filename}")
    if got != nnz:
        from eigenkernel_tpu.io.matrix_market import MatrixMarketError
        raise MatrixMarketError(
            f"{filename}: expected {nnz} entries, native parser got {got}")
    return SparseMatrix(size=info.rows, rows=rows, cols=cols, values=vals)


def write_indexed(path: str, values: np.ndarray, j_col: int = 0) -> bool:
    """Fast formatted write of an indexed-value file (two-column
    ``i value`` when j_col==0, three-column ``i j value`` otherwise).
    Returns False when the native library is unavailable (caller falls
    back to the Python writer)."""
    try:
        lib = _load()
    except OSError:
        return False
    v = np.ascontiguousarray(values, dtype=np.float64)
    got = lib.ekmm_write_indexed(
        path.encode(), v.shape[0], int(j_col),
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return got == v.shape[0]
