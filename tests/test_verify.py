"""Verifier unit tests (verifier.f90 semantics)."""

import numpy as np

from eigenkernel_tpu.core.types import EigenPairs
from eigenkernel_tpu.io import matrix_market as mm
from eigenkernel_tpu.solvers import solve
from eigenkernel_tpu.verify import (
    eval_orthogonality, eval_residual_norm, get_ipratios)

MAT = "/root/reference/matrix"


def test_residual_norm_exact(sym_factory):
    A = sym_factory(64)
    w, v = np.linalg.eigh(A)
    pairs = EigenPairs(values=w, vectors=v)
    a_norm, ave, mx = eval_residual_norm(A, pairs, 64)
    assert abs(a_norm - np.linalg.norm(A)) < 1e-10
    assert mx < 1e-14 and ave <= mx


def test_residual_norm_detects_garbage(sym_factory, rng):
    A = sym_factory(64)
    w = np.linalg.eigvalsh(A)
    v = rng.standard_normal((64, 64))
    v /= np.linalg.norm(v, axis=0)
    pairs = EigenPairs(values=w, vectors=v)
    _, ave, mx = eval_residual_norm(A, pairs, 64)
    assert mx > 0.01


def test_orthogonality_metric(sym_factory, spd_factory):
    A, B = sym_factory(48), spd_factory(48)
    import scipy.linalg as sla
    w, v = sla.eigh(A, B)
    pairs = EigenPairs(values=w, vectors=v)
    # B-metric orthogonality of dsygv vectors ~ machine eps
    assert eval_orthogonality(pairs, 1, 48, B) < 1e-12
    # plain V^T V of B-orthonormal vectors is NOT orthogonal
    assert eval_orthogonality(pairs, 1, 48) > 1e-4


def test_ipratios_ground_truth():
    a = mm.read_matrix(f"{MAT}/ELSES_MATRIX_BNZ30_A.mtx").to_dense()
    b = mm.read_matrix(f"{MAT}/ELSES_MATRIX_BNZ30_B.mtx").to_dense()
    ref = np.loadtxt(f"{MAT}/ELSES_MATRIX_BNZ30_ipr.txt")[:, 1]
    p = solve(a, b, solver="general_eigh")
    ipr = get_ipratios(p, b)
    # near-degenerate pairs allow basis rotation; compare cluster-robustly
    assert np.abs(ipr - ref).max() < 1e-6
    # (note: B-metric ipratios are not confined to [1/n, 1])
    assert (ipr > 0).all()


def test_ipratios_localized_vector():
    n = 16
    v = np.zeros((n, 2))
    v[0, 0] = 1.0                      # fully localized: ipr = 1
    v[:, 1] = 1.0 / np.sqrt(n)         # fully delocalized: ipr = 1/n
    pairs = EigenPairs(values=np.zeros(2), vectors=v)
    ipr = get_ipratios(pairs)
    assert abs(ipr[0] - 1.0) < 1e-12
    assert abs(ipr[1] - 1.0 / n) < 1e-12
