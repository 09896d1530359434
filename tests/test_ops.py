"""Kernel unit tests vs numpy/scipy (SURVEY.md §4 strategy item (a))."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg as sla

from eigenkernel_tpu.ops import (
    apply_q,
    bisect_eigenvalues,
    blocked_cholesky,
    cholqr2,
    invert_lower_triangular,
    recover,
    reduce_elpa,
    reduce_scalapack,
    tridiag_eigh,
    tridiag_matrix,
    tridiag_solve_shifted,
    tridiagonalize,
    trsm_lower,
    trsm_right_lower_t,
)
from eigenkernel_tpu.ops.band import apply_band_q, to_band


@pytest.mark.parametrize("n,b", [(64, 64), (128, 32), (192, 64)])
def test_blocked_cholesky(spd_factory, n, b):
    B = spd_factory(n)
    L = np.linalg.cholesky(B)
    Lj = np.array(blocked_cholesky(jnp.asarray(B), block=b))
    assert np.abs(Lj - L).max() < 1e-12 * np.abs(L).max()


def test_invert_lower_triangular(spd_factory):
    L = np.linalg.cholesky(spd_factory(160))
    X = np.array(invert_lower_triangular(jnp.asarray(L), block=32))
    assert np.abs(X @ L - np.eye(160)).max() < 1e-12


def test_trsm_variants(spd_factory, rng):
    n, k, b = 128, 40, 32
    L = np.linalg.cholesky(spd_factory(n))
    B = rng.standard_normal((n, k))
    x1 = np.array(trsm_lower(jnp.asarray(L), jnp.asarray(B), block=b))
    assert np.abs(L @ x1 - B).max() < 1e-12
    x2 = np.array(trsm_lower(jnp.asarray(L), jnp.asarray(B), transpose=True,
                             block=b))
    assert np.abs(L.T @ x2 - B).max() < 1e-12
    x3 = np.array(trsm_right_lower_t(jnp.asarray(L), jnp.asarray(B.T),
                                     block=b))
    assert np.abs(x3 @ L.T - B.T).max() < 1e-12


def test_tridiagonalize_similarity(sym_factory):
    n, b = 192, 64
    A = sym_factory(n)
    tri = tridiagonalize(jnp.asarray(A), block=b)
    wT = np.sort(sla.eigvalsh_tridiagonal(np.array(tri.d), np.array(tri.e)))
    wA = np.linalg.eigvalsh(A)
    assert np.abs(wT - wA).max() < 1e-11
    Q = np.array(apply_q(tri, jnp.eye(n), block=b))
    T = np.array(tridiag_matrix(tri.d, tri.e))
    assert np.abs(Q @ Q.T - np.eye(n)).max() < 1e-13
    assert np.abs(Q @ T @ Q.T - A).max() < 1e-12


def test_tridiagonalize_chunked_update_bitexact(sym_factory, monkeypatch):
    # the huge-n row-blocked rank-2b trailing update (EK_SYTRD_UPDATE_
    # TEMP_MB cap, selecting-32k memory fix) must partition exactly —
    # an overlapped block would subtract the update twice.  Forcing the
    # cap to 0 chunks at every size; results must be BIT-identical to
    # the single-GEMM form (same multiplies, same order per row).
    n, b = 192, 64
    A = sym_factory(n)
    ref = tridiagonalize(jnp.asarray(A), block=b)
    monkeypatch.setenv("EK_SYTRD_UPDATE_TEMP_MB", "0")
    import jax

    jax.clear_caches()  # the env knob is read at trace time
    chunked = tridiagonalize(jnp.asarray(A), block=b)
    jax.clear_caches()
    assert np.array_equal(np.array(ref.d), np.array(chunked.d))
    assert np.array_equal(np.array(ref.e), np.array(chunked.e))
    assert np.array_equal(np.array(ref.V), np.array(chunked.V))


def test_bisect_eigenvalues(sym_factory):
    A = sym_factory(100)
    tri = tridiagonalize(jnp.asarray(A), block=50)
    d, e = np.array(tri.d), np.array(tri.e)
    ref = sla.eigvalsh_tridiagonal(d, e)
    lam = np.array(bisect_eigenvalues(tri.d, tri.e, jnp.arange(100)))
    assert np.abs(lam - ref).max() < 1e-11
    # subset
    lam5 = np.array(bisect_eigenvalues(tri.d, tri.e, jnp.arange(5)))
    assert np.abs(lam5 - ref[:5]).max() < 1e-11


def test_tridiag_solve_shifted(rng):
    n, k = 80, 7
    d = jnp.asarray(rng.standard_normal(n))
    e = jnp.asarray(rng.standard_normal(n - 1))
    lam = jnp.asarray(rng.standard_normal(k) * 0.1)
    b = jnp.asarray(rng.standard_normal((n, k)))
    x = np.array(tridiag_solve_shifted(d, e, lam, b))
    T = np.array(tridiag_matrix(d, e))
    for j in range(k):
        r = (T - float(lam[j]) * np.eye(n)) @ x[:, j] - np.array(b)[:, j]
        assert np.abs(r).max() < 1e-8


def test_tridiag_eigh_full_and_degenerate():
    rng = np.random.default_rng(3)
    d = jnp.asarray(rng.standard_normal(150))
    e = jnp.asarray(rng.standard_normal(149))
    T = np.array(tridiag_matrix(d, e))
    w, v = tridiag_eigh(d, e)
    w, v = np.array(w), np.array(v)
    assert np.abs(T @ v - v * w).max() < 1e-12
    assert np.abs(v.T @ v - np.eye(150)).max() < 1e-12
    # repeated eigenvalues (block diagonal)
    d2 = jnp.asarray(np.concatenate([np.full(40, 2.0), np.linspace(3, 4, 40)]))
    e2 = jnp.asarray(np.zeros(79))
    w2, v2 = tridiag_eigh(d2, e2)
    T2 = np.array(tridiag_matrix(d2, e2))
    assert np.abs(T2 @ np.array(v2) - np.array(v2) * np.array(w2)).max() < 1e-12
    assert np.abs(np.array(v2).T @ np.array(v2) - np.eye(80)).max() < 1e-12


def test_cholqr2(rng):
    v = rng.standard_normal((200, 50))
    q = np.array(cholqr2(jnp.asarray(v)))
    assert np.abs(q.T @ q - np.eye(50)).max() < 1e-13
    # same column space
    assert np.abs(q @ (q.T @ v) - v).max() < 1e-10


def test_reductions(spd_factory, sym_factory):
    n = 128
    A, B = sym_factory(n), spd_factory(n)
    wref = sla.eigh(A, B, eigvals_only=True)
    for fn in (reduce_scalapack, reduce_elpa):
        red = fn(jnp.asarray(A), jnp.asarray(B), block=32)
        w, z = np.linalg.eigh(np.array(red.a_std))
        assert np.abs(np.sort(w) - wref).max() < 1e-11
        x = np.array(recover(red, jnp.asarray(z), block=32))
        resid = A @ x - (B @ x) * w[None, :]
        assert np.abs(resid).max() < 1e-10


def test_to_band():
    rng = np.random.default_rng(5)
    n, bw = 256, 32
    A = rng.standard_normal((n, n))
    A = (A + A.T) / 2
    res = to_band(jnp.asarray(A), bw=bw)
    band = np.array(res.band)
    # band structure
    i, j = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    assert np.abs(band[np.abs(i - j) > bw]).max() == 0.0
    assert np.abs(band - band.T).max() < 1e-12
    # similarity
    wb = np.linalg.eigvalsh(band)
    wa = np.linalg.eigvalsh(A)
    assert np.abs(wb - wa).max() < 1e-11
    # Q orthogonal and A = Q band Q^T
    Q = np.array(apply_band_q(res, jnp.eye(n), bw=bw))
    assert np.abs(Q @ Q.T - np.eye(n)).max() < 1e-13
    assert np.abs(Q @ band @ Q.T - A).max() < 1e-11


def test_bulge_chase():
    import scipy.linalg as sla
    from eigenkernel_tpu.ops.bulge import apply_chase_q, band_to_tridiag

    rng = np.random.default_rng(7)
    n, bw = 96, 8
    A = rng.standard_normal((n, n))
    A = (A + A.T) / 2
    i, j = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    A = np.where(np.abs(i - j) <= bw, A, 0.0)
    res = band_to_tridiag(jnp.asarray(A), bw)
    d, e = np.array(res.d), np.array(res.e)
    wT = np.sort(sla.eigvalsh_tridiagonal(d, e))
    assert np.abs(wT - np.linalg.eigvalsh(A)).max() < 1e-11
    Q = np.array(apply_chase_q(res, jnp.eye(n), bw))
    Tm = np.diag(d) + np.diag(e, 1) + np.diag(e, -1)
    assert np.abs(Q @ Q.T - np.eye(n)).max() < 1e-13
    assert np.abs(Q @ Tm @ Q.T - A).max() < 1e-12


def test_bulge_chase_wavefront_matches_sequential():
    from eigenkernel_tpu.ops.bulge import (
        band_to_tridiag, band_to_tridiag_wavefront)

    rng = np.random.default_rng(9)
    n, bw = 120, 8
    A = rng.standard_normal((n, n))
    A = (A + A.T) / 2
    i, j = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    A = np.where(np.abs(i - j) <= bw, A, 0.0)
    r1 = band_to_tridiag(jnp.asarray(A), bw)
    r2 = band_to_tridiag_wavefront(jnp.asarray(A), bw)
    assert np.abs(np.array(r1.d) - np.array(r2.d)).max() < 1e-11
    assert np.abs(np.array(r1.e) - np.array(r2.e)).max() < 1e-11
    assert np.abs(np.array(r1.HV) - np.array(r2.HV)).max() < 1e-11
    assert np.abs(np.array(r1.HT) - np.array(r2.HT)).max() < 1e-11


@pytest.mark.parametrize("n,bw", [(120, 8), (96, 16), (130, 8), (160, 4)])
def test_bulge_chase_wavefront2_matches_sequential(n, bw):
    # lean lower-banded stagger-4 rewrite (the TPU default schedule):
    # same reflectors as the sequential chase up to rounding
    from eigenkernel_tpu.ops.bulge import (
        band_to_tridiag, band_to_tridiag_wavefront2)

    rng = np.random.default_rng(n + bw)
    A = rng.standard_normal((n, n))
    A = (A + A.T) / 2
    i, j = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    A = np.where(np.abs(i - j) <= bw, A, 0.0)
    r1 = band_to_tridiag(jnp.asarray(A), bw)
    r2 = band_to_tridiag_wavefront2(jnp.asarray(A), bw)
    assert np.abs(np.array(r1.d) - np.array(r2.d)).max() < 1e-10
    assert np.abs(np.array(r1.e) - np.array(r2.e)).max() < 1e-10
    assert np.abs(np.array(r1.HV) - np.array(r2.HV)).max() < 1e-10
    assert np.abs(np.array(r1.HT) - np.array(r2.HT)).max() < 1e-10


def test_back_transform_wy_grouping(sym_factory, rng):
    # grouped compact-WY back-transform is exact vs per-panel (the WY
    # identity holds for any number of consecutive reflectors); covers
    # the identity last panel slot of the band V store
    n, b = 192, 32
    A = sym_factory(n)
    tri = tridiagonalize(jnp.asarray(A), block=b)
    z = jnp.asarray(rng.standard_normal((n, n // 2)))
    base = np.array(apply_q(tri, z, block=b, group=1))
    base_t = np.array(apply_q(tri, z, block=b, transpose=True, group=1))
    for g in (2, 3, 6):
        got = np.array(apply_q(tri, z, block=b, group=g))
        assert np.abs(got - base).max() < 1e-12
        got_t = np.array(apply_q(tri, z, block=b, transpose=True, group=g))
        assert np.abs(got_t - base_t).max() < 1e-12
    res = to_band(jnp.asarray(A), bw=b)
    b1 = np.array(apply_band_q(res, z, bw=b, group=1))
    for g in (2, 3, 6):
        gg = np.array(apply_band_q(res, z, bw=b, group=g))
        assert np.abs(gg - b1).max() < 1e-12
