"""Multi-device tests on the 8-way virtual CPU mesh (SURVEY.md §4 (c)).

The JAX analog of the reference's "mpirun -np 4 on one box": a 2x4 device
grid, real shardings, XLA collectives — validating that every distributed
pipeline produces single-device-identical results.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg as sla

from eigenkernel_tpu.ops import blocked_cholesky, invert_lower_triangular
from eigenkernel_tpu.parallel import (
    distribute, gather, layout_grid, make_mesh, mat_sharding, padded_dim,
)
from eigenkernel_tpu.solvers import solve


def test_layout_grid():
    # near-square factorizations, r <= c (processes.f90:56-65 parity)
    assert layout_grid(1) == (1, 1)
    assert layout_grid(4) == (2, 2)
    assert layout_grid(8) == (2, 4)
    assert layout_grid(6) == (2, 3)
    assert layout_grid(7) == (1, 7)
    assert layout_grid(12) == (3, 4)


def test_padded_dim(mesh8):
    assert padded_dim(30, mesh8, 8) == 32
    assert padded_dim(64, mesh8, 64) == 64
    assert padded_dim(65, mesh8, 64) == 128


def test_make_mesh_shapes():
    m = make_mesh()
    assert m.devices.shape == (2, 4)
    assert m.axis_names == ("r", "c")
    with pytest.raises(ValueError):
        make_mesh(shape=(3, 3))


def test_distribute_gather(mesh8, rng):
    a = rng.standard_normal((64, 64))
    d = distribute(a, mesh8)
    assert d.sharding == mat_sharding(mesh8)
    assert np.array_equal(gather(d), a)


def test_sharded_cholesky(mesh8, spd_factory):
    B = spd_factory(128)
    ref = np.linalg.cholesky(B)
    d = distribute(B, mesh8)
    L = np.array(blocked_cholesky(d, block=32, mesh=mesh8))
    assert np.abs(L - ref).max() < 1e-12


def test_sharded_invert(mesh8, spd_factory):
    L = np.linalg.cholesky(spd_factory(128))
    X = np.array(invert_lower_triangular(distribute(L, mesh8), block=32,
                                         mesh=mesh8))
    assert np.abs(X @ L - np.eye(128)).max() < 1e-12


@pytest.mark.parametrize("solver", ["scalapack", "general_elpa2",
                                    "general_scalapack"])
def test_sharded_solve_matches_reference(mesh8, solver):
    rng = np.random.default_rng(21)
    n = 96
    A = rng.standard_normal((n, n))
    A = (A + A.T) / 2
    if solver.startswith("general"):
        Br = rng.standard_normal((n, n))
        B = Br @ Br.T + n * np.eye(n)
        wref = sla.eigh(A, B, eigvals_only=True)
        p = solve(A, B, solver=solver, mesh=mesh8)
        V = np.array(p.vectors)
        resid = A @ V - (B @ V) * np.array(p.values)[None, :]
    else:
        B = None
        wref = np.linalg.eigvalsh(A)
        p = solve(A, solver=solver, mesh=mesh8)
        V = np.array(p.vectors)
        resid = A @ V - V * np.array(p.values)[None, :]
    assert p.sharded
    assert np.abs(np.array(p.values) - wref).max() < 1e-10
    assert np.abs(resid).max() < 1e-9
