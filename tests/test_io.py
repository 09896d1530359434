"""MatrixMarket IO tests (reference acceptance: BNZ30 header = 30/30/303)."""

import numpy as np
import pytest

from eigenkernel_tpu.io import matrix_market as mm

BNZ30_A = "/root/reference/matrix/ELSES_MATRIX_BNZ30_A.mtx"
VCNT400 = "/root/reference/matrix/ELSES_MATRIX_VCNT400std_A.mtx"


def test_header_probe_bnz30():
    info = mm.read_header(BNZ30_A)
    assert (info.rows, info.cols, info.entries) == (30, 30, 303)
    assert info.rep == "coordinate"
    assert info.field == "real"
    assert info.symm == "symmetric"


def test_read_bnz30():
    mat = mm.read_matrix(BNZ30_A)
    assert mat.size == 30
    assert mat.nnz == 303
    dense = mat.to_dense()
    assert np.allclose(dense, dense.T)
    # first entry of the file: (1,1) = -0.78642931690896522579
    assert dense[0, 0] == pytest.approx(-0.78642931690896522579, abs=0)


def test_read_vcnt400():
    info = mm.read_header(VCNT400)
    assert info.rows == 400 and info.entries == 8200
    mat = mm.read_matrix(VCNT400, info)
    assert mat.nnz == 8200


def test_numpy_and_native_agree(tmp_path):
    info = mm.read_header(BNZ30_A)
    py = mm._read_numpy(BNZ30_A, info)
    try:
        from eigenkernel_tpu.io import native_mm
        nat = native_mm.read_coordinate(BNZ30_A, info)
    except OSError:
        pytest.skip("native parser unavailable")
    assert np.array_equal(py.rows, nat.rows)
    assert np.array_equal(py.cols, nat.cols)
    assert np.array_equal(py.values, nat.values)


def test_write_read_roundtrip(tmp_path, rng):
    n = 12
    a = rng.standard_normal((n, n))
    a = np.tril(a + a.T)
    r, c = np.nonzero(a)
    mat = mm.SparseMatrix(size=n, rows=r, cols=c, values=a[r, c]) \
        if hasattr(mm, "SparseMatrix") else None
    from eigenkernel_tpu.core.types import SparseMatrix
    mat = SparseMatrix(size=n, rows=r, cols=c, values=a[r, c])
    path = str(tmp_path / "m.mtx")
    mm.write_matrix(path, mat)
    back = mm.read_matrix(path)
    assert np.allclose(back.to_dense(), mat.to_dense())


def test_bad_banner(tmp_path):
    p = tmp_path / "bad.mtx"
    p.write_text("%%NotMatrixMarket foo\n1 1 1\n1 1 2.0\n")
    with pytest.raises(mm.MatrixMarketError):
        mm.read_header(str(p))


def test_dimension_mismatch(tmp_path):
    p = tmp_path / "rect.mtx"
    p.write_text("%%MatrixMarket matrix coordinate real general\n2 3 1\n1 1 5.0\n")
    with pytest.raises(mm.MatrixMarketError):
        mm.read_matrix(str(p))
