"""n=1024 correctness (VERDICT round-1 weak #8): exercises padding, scan
chunking, chase pipeline fill/drain, and the D&C tree at a size where they
actually bite — not just the n<=300 unit sizes."""

import numpy as np
import pytest

import jax

from eigenkernel_tpu.solvers.api import solve


@pytest.fixture(scope="module")
def pencil_1024():
    rng = np.random.default_rng(0)
    n = 1024
    a = rng.standard_normal((n, n))
    return a + a.T


@pytest.mark.parametrize("solver", ["scalapack", "eigensx"])
def test_n1024(pencil_1024, solver):
    a = pencil_1024
    n = a.shape[0]
    p = solve(a, solver=solver, block_size=64)
    jax.block_until_ready(p.vectors)
    w_ref = np.linalg.eigvalsh(a)
    scale = np.abs(w_ref).max()
    assert np.abs(np.asarray(p.values) - w_ref).max() / scale < 1e-13
    v = np.asarray(p.vectors)
    r = a @ v - v * np.asarray(p.values)[None, :]
    assert np.abs(r).max() / np.linalg.norm(a) < 1e-13
    assert np.abs(v.T @ v - np.eye(n)).max() < 1e-13
