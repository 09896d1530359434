"""Every registry solver vs scipy on random pencils (SURVEY.md §4 (a)/(b))."""

import numpy as np
import pytest
import scipy.linalg as sla

from eigenkernel_tpu.solvers import SOLVERS, solve
from eigenkernel_tpu.solvers.registry import get_spec, UnknownSolverError

N = 96  # one shared dim so jitted stages are compiled once across solvers


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(11)
    A = rng.standard_normal((N, N))
    A = (A + A.T) / 2
    Br = rng.standard_normal((N, N))
    B = Br @ Br.T + N * np.eye(N)
    wstd = np.linalg.eigvalsh(A)
    wgen = sla.eigh(A, B, eigvals_only=True)
    return A, B, wstd, wgen


STANDARD = [s.name for s in SOLVERS.values() if not s.generalized]
GENERAL = [s.name for s in SOLVERS.values() if s.generalized]


@pytest.mark.parametrize("name", STANDARD)
def test_standard_solvers(problem, name):
    A, _, wstd, _ = problem
    spec = get_spec(name)
    n_vec = 10 if spec.selecting else None
    p = solve(A, solver=name, n_vec=n_vec)
    k = n_vec or N
    assert np.abs(np.array(p.values) - wstd[:k]).max() < 1e-10
    V = np.array(p.vectors)
    resid = A @ V - V * np.array(p.values)[None, :]
    assert np.abs(resid).max() < 1e-10
    assert np.abs(V.T @ V - np.eye(k)).max() < 1e-10


@pytest.mark.parametrize("name", GENERAL)
def test_generalized_solvers(problem, name):
    A, B, _, wgen = problem
    spec = get_spec(name)
    n_vec = 10 if spec.selecting else None
    p = solve(A, B, solver=name, n_vec=n_vec)
    k = n_vec or N
    assert np.abs(np.array(p.values) - wgen[:k]).max() < 1e-10
    V = np.array(p.vectors)
    resid = A @ V - (B @ V) * np.array(p.values)[None, :]
    assert np.abs(resid).max() < 1e-9
    assert np.abs(V.T @ B @ V - np.eye(k)).max() < 1e-9


def test_solver_problem_mismatch(problem):
    A, B, _, _ = problem
    with pytest.raises(ValueError):
        solve(A, B, solver="scalapack")
    with pytest.raises(ValueError):
        solve(A, solver="general_scalapack")


def test_unknown_solver(problem):
    A, _, _, _ = problem
    with pytest.raises(UnknownSolverError):
        solve(A, solver="does_not_exist")


def test_partial_on_nonselecting(problem):
    A, _, _, _ = problem
    with pytest.raises(ValueError):
        solve(A, solver="scalapack", n_vec=5)


def test_odd_dimension_padding(problem):
    """Non-power-of-two, non-block-divisible dims exercise padding."""
    rng = np.random.default_rng(12)
    n = 77
    A = rng.standard_normal((n, n))
    A = (A + A.T) / 2
    p = solve(A, solver="scalapack")
    wref = np.linalg.eigvalsh(A)
    assert np.abs(np.array(p.values) - wref).max() < 1e-10
    assert p.vectors.shape == (n, n)


def test_staged_sytrd(problem, monkeypatch):
    """Host-stepped uniform-schedule sytrd (the >28672 worker-crash dodge,
    evidence/SWEEP_r5.md chain T) must agree with the one-program bucketed
    path bit-for-bit in d/e and solve correctly end to end."""
    import jax.numpy as jnp

    from eigenkernel_tpu.ops import householder as hh

    A, _, wstd, _ = problem
    a = jnp.asarray(A)
    t0 = hh.tridiagonalize(a, block=32)
    monkeypatch.setenv("EK_SYTRD_STAGE_CHUNK", "2")  # main + tail path
    t1 = hh.tridiagonalize_staged(a, block=32)
    assert float(jnp.max(jnp.abs(t0.d - t1.d))) == 0.0
    assert float(jnp.max(jnp.abs(t0.e - t1.e))) == 0.0
    assert float(jnp.max(jnp.abs(t0.V - t1.V))) == 0.0
    monkeypatch.setenv("EK_SYTRD_STAGED", "1")
    p = solve(A, solver="scalapack")
    assert np.abs(np.array(p.values) - wstd).max() < 1e-10
    V = np.array(p.vectors)
    resid = A @ V - V * np.array(p.values)[None, :]
    assert np.abs(resid).max() < 1e-10


def test_force_npad(problem, monkeypatch):
    """EK_FORCE_NPAD pads the working dim past the natural multiple without
    changing results — the dodge for the 2^32-byte buffer platform wall
    (evidence/SWEEP_r5.md chain S: n_pad=32768 f32 = exactly 4 GiB crashes
    the TPU worker; one extra panel of sentinel padding avoids the size)."""
    A, _, wstd, _ = problem
    p0 = solve(A, solver="scalapack_select", n_vec=10)
    monkeypatch.setenv("EK_FORCE_NPAD", "160")
    p1 = solve(A, solver="scalapack_select", n_vec=10)
    assert p1.vectors.shape == (N, 10)
    assert np.abs(np.array(p1.values) - np.array(p0.values)).max() < 1e-12
    V = np.array(p1.vectors)
    resid = A @ V - V * np.array(p1.values)[None, :]
    assert np.abs(resid).max() < 1e-10


def test_float32(problem):
    # residual-based bound (VERDICT r2 #8): ~1e-5 * ||A||_F catches a
    # mis-scaled reflector that the old 5e-3 eigenvalue bound would hide
    A, _, wstd, _ = problem
    p = solve(A.astype(np.float32), solver="scalapack")
    assert p.values.dtype == np.float32
    V = np.array(p.vectors, dtype=np.float64)
    resid = A @ V - V * np.array(p.values, dtype=np.float64)[None, :]
    a_norm = np.linalg.norm(A)
    assert np.abs(resid).max() / a_norm < 1e-5
    assert np.abs(V.T @ V - np.eye(N)).max() < 1e-4
    assert np.abs(np.array(p.values) - wstd).max() < 1e-4 * a_norm


def test_selecting_forced_cluster_large():
    """pdsyevx cluster-pathology parity (solver_scalapack_select.f90:104-135):
    a tight eigenvalue cluster inside the selected window must come out
    with orthonormal eigenvectors (shift separation + CholeskyQR2)."""
    n, k = 2048, 64
    rng = np.random.default_rng(17)
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    w = np.sort(rng.standard_normal(n) * 10.0)
    # force a 24-wide near-degenerate cluster straddling the selection edge
    w[40:64] = w[40] + np.arange(24) * 1e-13
    A = (q * w) @ q.T
    A = (A + A.T) / 2
    p = solve(A, solver="scalapack_select", n_vec=k)
    vals = np.array(p.values)
    assert np.abs(vals - np.sort(w)[:k]).max() < 1e-8 * np.abs(w).max()
    V = np.array(p.vectors)
    # orthogonality INSIDE the cluster is the failure mode being tested
    assert np.abs(V.T @ V - np.eye(k)).max() < 1e-9
    resid = A @ V - V * vals[None, :]
    assert np.abs(resid).max() / np.linalg.norm(A) < 1e-12


def test_select_two_stage_core(problem, monkeypatch):
    # VERDICT r2 #3: the selecting path routed through the two-stage core
    # (full->band->tridiag + bisect/invit + k-column back-transform)
    A, B, wstd, wgen = problem
    monkeypatch.setenv("EK_SELECT_CORE", "two_stage")
    p = solve(A, solver="scalapack_select", n_vec=10)
    assert np.abs(np.array(p.values) - wstd[:10]).max() < 1e-10
    V = np.array(p.vectors)
    resid = A @ V - V * np.array(p.values)[None, :]
    assert np.abs(resid).max() < 1e-10
    assert np.abs(V.T @ V - np.eye(10)).max() < 1e-10
    pg = solve(A, B, solver="general_scalapack_select", n_vec=10)
    assert np.abs(np.array(pg.values) - wgen[:10]).max() < 1e-10


def test_auto_solver_resolution(problem, monkeypatch):
    # '-s auto' resolves to the measured-best concrete pipeline
    from eigenkernel_tpu.solvers.registry import resolve_auto

    # selecting always routes to the pdsyevx-analog path
    assert resolve_auto("auto", 8192, False, True, False, "tpu") == \
        "scalapack_select"
    assert resolve_auto("general_auto", 8192, True, True, False, "tpu") == \
        "general_scalapack_select"
    # single-chip TPU small n: XLA eigh; large n: staged one-stage
    assert resolve_auto("auto", 1024, False, False, False, "tpu") == "eigh"
    assert resolve_auto("auto", 4096, False, False, False, "tpu") == \
        "scalapack"
    # gen mid-range: the measured 12-name sweep winner (pdsyngst-style
    # half-matrix reduction, evidence/SWEEP_r4.md sweep_gen4096c)
    assert resolve_auto("general_auto", 4096, True, False, False, "tpu") == \
        "general_scalapacknew_eigens"
    # on a mesh the fused single-device eigh is not applicable
    assert resolve_auto("auto", 512, False, False, True, "tpu") == \
        "scalapack"
    # single-chip TPU very large n: the two-stage pipeline wins
    # (9.67 s vs 12.24 s at 16384, RESULTS_r4.md r4e)
    assert resolve_auto("auto", 16384, False, False, False, "tpu") == \
        "eigensx"
    assert resolve_auto("general_auto", 16384, True, False, False,
                        "tpu") == "general_elpa_eigensx"
    # ... but not on a mesh (chunked-chase routing measured separately)
    assert resolve_auto("auto", 16384, False, False, True, "tpu") == \
        "scalapack"
    # crossover knobs
    monkeypatch.setenv("EK_AUTO_EIGH_MAX", "4096")
    assert resolve_auto("auto", 4096, False, False, False, "tpu") == "eigh"
    monkeypatch.setenv("EK_AUTO_TWOSTAGE_MIN", "8192")
    assert resolve_auto("auto", 8192, False, False, False, "tpu") == \
        "eigensx"
    # kind mismatch raises the registry error
    with pytest.raises(UnknownSolverError):
        resolve_auto("auto", 512, True, False, False, "cpu")


def test_auto_solver_solve(problem):
    A, B, wstd, wgen = problem
    p = solve(A, solver="auto")
    assert np.abs(np.array(p.values) - wstd).max() < 1e-10
    pg = solve(A, B, solver="general_auto", n_vec=10)
    assert np.abs(np.array(pg.values) - wgen[:10]).max() < 1e-10
