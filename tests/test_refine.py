"""Mixed-precision refinement tests (ops/refine.py, dtype='mixed')."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg as sla

from eigenkernel_tpu.io import matrix_market as mm
from eigenkernel_tpu.ops.refine import refine_eigenpairs
from eigenkernel_tpu.solvers import solve


def test_refine_standard(sym_factory):
    A = sym_factory(150)
    anorm = np.linalg.norm(A)
    w32, v32 = np.linalg.eigh(A.astype(np.float32))
    w, v = refine_eigenpairs(jnp.asarray(A), jnp.asarray(v32))
    w, v = np.array(w), np.array(v)
    assert np.abs(A @ v - v * w).max() / anorm < 1e-14
    assert np.abs(v.T @ v - np.eye(150)).max() < 1e-12
    assert np.abs(np.sort(w) - np.linalg.eigvalsh(A)).max() < 1e-12


def test_refine_generalized(sym_factory, spd_factory):
    n = 150
    A, B = sym_factory(n), spd_factory(n)
    wg32, vg32 = sla.eigh(A.astype(np.float32), B.astype(np.float32))
    w, v = refine_eigenpairs(jnp.asarray(A), jnp.asarray(vg32),
                             b=jnp.asarray(B))
    w, v = np.array(w), np.array(v)
    assert np.abs(A @ v - (B @ v) * w).max() / np.linalg.norm(A) < 1e-13
    assert np.abs(v.T @ B @ v - np.eye(n)).max() < 1e-11
    assert np.abs(np.sort(w) - sla.eigh(A, B, eigvals_only=True)).max() < 1e-11


def test_refine_degenerate(rng):
    n = 120
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    w_true = np.concatenate([np.full(30, 1.0), np.linspace(2, 3, 90)])
    A = (q * w_true) @ q.T
    w32, v32 = np.linalg.eigh(A.astype(np.float32))
    w, v = refine_eigenpairs(jnp.asarray(A), jnp.asarray(v32))
    w, v = np.array(w), np.array(v)
    assert np.abs(A @ v - v * w).max() < 1e-12
    assert np.abs(v.T @ v - np.eye(n)).max() < 1e-11


def test_refine_two_vectors(sym_factory):
    # regression: k==2 gives the parity-1 adjacent-Jacobi pass zero
    # pairs; the gather-free slice rewrite must early-return instead of
    # building an empty lax.slice (advisor r3 finding, refine.py:218)
    n = 80
    A = sym_factory(n)
    w32, v32 = np.linalg.eigh(A.astype(np.float32))
    vk = v32[:, :2]
    w, v = refine_eigenpairs(jnp.asarray(A), jnp.asarray(vk))
    w, v = np.array(w), np.array(v)
    wref = np.linalg.eigvalsh(A)[:2]
    assert np.abs(np.sort(w) - wref).max() < 1e-12
    assert np.abs(v.T @ v - np.eye(2)).max() < 1e-11


def test_solve_mixed_dtype(sym_factory, spd_factory):
    n = 96
    A, B = sym_factory(n), spd_factory(n)
    p = solve(A, B, solver="general_elpa2", dtype="mixed")
    assert p.values.dtype == np.float64
    w, v = np.array(p.values), np.array(p.vectors)
    wref = sla.eigh(A, B, eigvals_only=True)
    assert np.abs(w - wref).max() < 1e-11
    assert np.abs(A @ v - (B @ v) * w).max() / np.linalg.norm(A) < 1e-13


def test_solve_mixed_bnz30_ground_truth():
    mat = "/root/reference/matrix"
    a = mm.read_matrix(f"{mat}/ELSES_MATRIX_BNZ30_A.mtx").to_dense()
    b = mm.read_matrix(f"{mat}/ELSES_MATRIX_BNZ30_B.mtx").to_dense()
    ref = np.loadtxt(f"{mat}/ELSES_MATRIX_BNZ30_ev.txt")[:, 1]
    p = solve(a, b, solver="general_elpa2", dtype="mixed")
    # near-degenerate pairs (gap ~4e-9) must still come out at f64 accuracy
    assert np.abs(np.array(p.values) - ref).max() < 1e-12
