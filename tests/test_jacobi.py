"""Block-Jacobi eigensolver (TPU extra family)."""

import numpy as np
import pytest
import scipy.linalg as sla

import jax
import jax.numpy as jnp

from eigenkernel_tpu.ops.jacobi import block_jacobi_eigh
from eigenkernel_tpu.solvers import solve


@pytest.mark.parametrize("n,b", [(64, 8), (96, 16), (130, 13)])
def test_jacobi_core(n, b):
    rng = np.random.default_rng(n)
    a = rng.standard_normal((n, n))
    a = a + a.T
    w, v = jax.jit(lambda x: block_jacobi_eigh(x, block=b))(jnp.asarray(a))
    w, v = np.asarray(w), np.asarray(v)
    w_ref = np.linalg.eigvalsh(a)
    s = np.abs(w_ref).max()
    assert np.abs(w - w_ref).max() / s < 1e-13
    assert np.abs(a @ v - v * w[None, :]).max() / s < 1e-13
    assert np.abs(v.T @ v - np.eye(n)).max() < 1e-13


def test_jacobi_degenerate():
    # repeated eigenvalues (the permutation-cycle regression case)
    rng = np.random.default_rng(2)
    n = 64
    w_deg = np.repeat(np.arange(n // 4), 4).astype(float)
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    a = (q * w_deg[None, :]) @ q.T
    w, v = block_jacobi_eigh(jnp.asarray(a), block=8)
    assert np.abs(np.asarray(w) - w_deg).max() < 1e-12
    v = np.asarray(v)
    assert np.abs(a @ v - v * np.asarray(w)[None, :]).max() < 1e-12


def test_jacobi_solver_registry():
    rng = np.random.default_rng(3)
    n = 96
    a = rng.standard_normal((n, n))
    a = a + a.T
    l = rng.standard_normal((n, n)) * 0.1
    b = l @ l.T + n * np.eye(n)
    p = solve(a, solver="jacobi", block_size=16)
    w_ref = np.linalg.eigvalsh(a)
    assert np.abs(np.asarray(p.values) - w_ref).max() < 1e-12
    pg = solve(a, b, solver="general_jacobi", block_size=16)
    wg_ref = sla.eigh(a, b, eigvals_only=True)
    assert np.abs(np.asarray(pg.values) - wg_ref).max() < 1e-11
    v = np.asarray(pg.vectors)
    r = a @ v - b @ v * np.asarray(pg.values)[None, :]
    assert np.abs(r).max() / np.linalg.norm(a) < 1e-12


def test_jacobi_mesh(mesh8):
    rng = np.random.default_rng(4)
    n = 96
    a = rng.standard_normal((n, n))
    a = a + a.T
    p = solve(a, solver="jacobi", mesh=mesh8, block_size=16)
    w_ref = np.linalg.eigvalsh(a)
    assert np.abs(np.asarray(p.values) - w_ref).max() < 1e-12
