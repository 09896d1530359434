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


def test_distribute_coo_shard_local(mesh8, monkeypatch):
    # VERDICT r2 #5: COO broadcast + shard-local densify — no process may
    # materialize the full dense matrix before placement.  to_dense is
    # poisoned; each addressable shard holds exactly n^2/8 elements.
    import jax

    from eigenkernel_tpu.core.types import SparseMatrix
    from eigenkernel_tpu.parallel.mesh import distribute_coo

    n = 4096
    rng = np.random.default_rng(11)
    nnz = 40 * n
    rows = rng.integers(0, n, nnz)
    cols = rng.integers(0, rows + 1)           # lower triangle
    vals = rng.standard_normal(nnz)
    diag = np.arange(n)
    coo = SparseMatrix(size=n,
                       rows=np.concatenate([rows, diag]),
                       cols=np.concatenate([cols, diag]),
                       values=np.concatenate([vals, np.ones(n)]))

    def poisoned(self, dtype=np.float64):
        raise AssertionError("full dense materialized on host")

    monkeypatch.setattr(SparseMatrix, "to_dense", poisoned)
    x = distribute_coo(coo, mesh8, np.float64)
    assert x.shape == (n, n)
    shard_elems = {s.data.size for s in x.addressable_shards}
    assert shard_elems == {n * n // 8}
    monkeypatch.undo()
    ref = coo.to_dense(np.float64)
    sub = np.asarray(x[:128, :128])
    assert np.array_equal(sub, ref[:128, :128])
    assert float(jnp.sum(jnp.abs(x))) == pytest.approx(np.abs(ref).sum(),
                                                       rel=1e-12)


def test_distribute_coo_pads_uneven(mesh8):
    from eigenkernel_tpu.core.types import SparseMatrix
    from eigenkernel_tpu.parallel.mesh import distribute_coo
    from eigenkernel_tpu.solvers import solve

    n = 30
    rng = np.random.default_rng(3)
    a_h = rng.standard_normal((n, n))
    a_h = (a_h + a_h.T) / 2
    il, jl = np.tril_indices(n)
    coo = SparseMatrix(size=n, rows=il, cols=jl, values=a_h[il, jl])
    x = distribute_coo(coo, mesh8, np.float64)
    assert x.shape == (32, 32)                  # lcm(2,4)-padded
    assert np.asarray(x[:n, :n]) == pytest.approx(a_h)
    assert float(jnp.sum(jnp.abs(x[n:, :]))) == 0.0
    p = solve(x, solver="scalapack", mesh=mesh8, n_logical=n)
    w_ref = np.linalg.eigvalsh(a_h)
    assert np.abs(np.asarray(p.values) - w_ref).max() < 1e-12
    assert p.vectors.shape == (n, n)
