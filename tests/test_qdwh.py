"""QDWH sign iteration + spectral divide-and-conquer (TPU extra family)."""

import numpy as np
import pytest
import scipy.linalg as sla

import jax
import jax.numpy as jnp

from eigenkernel_tpu.ops.qdwh import sign_qdwh, spectral_dc_eigh
from eigenkernel_tpu.solvers import solve


def _sym(n, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((n, n))
    return (a + a.T) / 2


def test_sign_function():
    a = _sym(96)
    w, q = np.linalg.eigh(a)
    s_ref = (q * np.sign(w)[None, :]) @ q.T
    s = np.asarray(sign_qdwh(jnp.asarray(a)))
    assert np.abs(s - s_ref).max() < 1e-13


def test_spectral_dc_core_multilevel():
    # base=128 at n=600 forces >= 2 recursion levels + ragged buckets
    n = 600
    a = _sym(n, seed=1)
    w, v = spectral_dc_eigh(jnp.asarray(a), base=128, block=128)
    w, v = np.asarray(w), np.asarray(v)
    w_ref = np.linalg.eigvalsh(a)
    s = np.abs(w_ref).max()
    assert np.abs(w - w_ref).max() / s < 1e-13
    assert np.abs(a @ v - v * w[None, :]).max() / s < 1e-12
    assert np.abs(v.T @ v - np.eye(n)).max() < 1e-13


def test_spectral_dc_pad_preservation():
    # sentinel-padded input: pad coordinates must ride through the
    # recursion as exact zeros and pad eigenpairs sort last
    n, m = 300, 384
    a = _sym(n, seed=2)
    rad = np.abs(a).sum(1)
    mu = (np.diag(a) + rad).max() + 10.0
    ap = np.zeros((m, m))
    ap[:n, :n] = a
    for i in range(n, m):
        ap[i, i] = mu
    w, v = spectral_dc_eigh(jnp.asarray(ap), n_real=n, base=128, block=128)
    w, v = np.asarray(w), np.asarray(v)
    w_ref = np.linalg.eigvalsh(a)
    assert np.abs(w[:n] - w_ref).max() / np.abs(w_ref).max() < 1e-13
    assert np.abs(v[n:, :n]).max() == 0.0
    assert np.abs(w[n:] - mu).max() < 1e-10


def test_spectral_dc_clustered():
    # repeated eigenvalues: splits inside a cluster must be rejected and
    # retried / fallen back without losing orthogonality
    rng = np.random.default_rng(3)
    n = 320
    w_deg = np.repeat(np.arange(n // 8), 8).astype(float)
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    a = (q * w_deg[None, :]) @ q.T
    a = (a + a.T) / 2
    w, v = spectral_dc_eigh(jnp.asarray(a), base=64, block=64)
    w, v = np.asarray(w), np.asarray(v)
    assert np.abs(w - w_deg).max() < 1e-12
    assert np.abs(a @ v - v * w[None, :]).max() < 1e-11
    assert np.abs(v.T @ v - np.eye(n)).max() < 1e-12


def test_spectral_dc_unsplittable():
    # a * I + tiny noise: every sigma candidate sits inside the single
    # cluster -> dense fallback must kick in and stay correct
    rng = np.random.default_rng(4)
    n = 300
    e = rng.standard_normal((n, n)) * 1e-13
    a = 3.0 * np.eye(n) + (e + e.T) / 2
    w, v = spectral_dc_eigh(jnp.asarray(a), base=64, block=64)
    w, v = np.asarray(w), np.asarray(v)
    assert np.abs(w - 3.0).max() < 1e-11
    assert np.abs(v.T @ v - np.eye(n)).max() < 1e-12


def test_spectral_dc_f32():
    n = 384
    a = _sym(n, seed=5).astype(np.float32)
    w, v = spectral_dc_eigh(jnp.asarray(a), base=128, block=128)
    w, v = np.asarray(w), np.asarray(v)
    w_ref = np.linalg.eigvalsh(a.astype(np.float64))
    s = np.abs(w_ref).max()
    assert np.abs(w - w_ref).max() / s < 1e-4
    assert np.abs(v.T @ v - np.eye(n, dtype=np.float32)).max() < 1e-4


def test_qdwh_solver_registry():
    n = 300
    a = _sym(n, seed=6)
    rng = np.random.default_rng(7)
    l = rng.standard_normal((n, n)) * 0.1
    b = l @ l.T + n * np.eye(n)
    p = solve(a, solver="qdwh_dc", block_size=16)
    w_ref = np.linalg.eigvalsh(a)
    assert np.abs(np.asarray(p.values) - w_ref).max() < 1e-12
    pg = solve(a, b, solver="general_qdwh_dc", block_size=16)
    wg_ref = sla.eigh(a, b, eigvals_only=True)
    assert np.abs(np.asarray(pg.values) - wg_ref).max() < 1e-11
    v = np.asarray(pg.vectors)
    r = a @ v - b @ v * np.asarray(pg.values)[None, :]
    assert np.abs(r).max() / np.linalg.norm(a) < 1e-12


def test_qdwh_mesh(mesh8):
    n = 512
    a = _sym(n, seed=8)
    w, v = spectral_dc_eigh(jnp.asarray(a), base=128, block=64, mesh=mesh8)
    w, v = np.asarray(w), np.asarray(v)
    w_ref = np.linalg.eigvalsh(a)
    s = np.abs(w_ref).max()
    assert np.abs(w - w_ref).max() / s < 1e-13
    assert np.abs(a @ v - v * w[None, :]).max() / s < 1e-12
    p = solve(a, solver="qdwh_dc", mesh=mesh8, block_size=64)
    assert np.abs(np.asarray(p.values) - w_ref).max() / s < 1e-13


def test_slice_pad_traced_edges():
    # traced off/kk with every size relation, incl. m_in < m_out and
    # off > m_in - m_out (the clamp+roll path)
    from eigenkernel_tpu.ops.qdwh import _j_slice_pad

    rng = np.random.default_rng(11)
    d = jnp.asarray(rng.standard_normal((40, 40)))
    for off, kk, m_out in [(0, 30, 32), (10, 30, 32), (25, 15, 16),
                           (0, 40, 48), (5, 35, 48), (30, 10, 64)]:
        out = np.asarray(_j_slice_pad(d, off, kk, m_out))
        ref = np.asarray(d)[off:off + kk, off:off + kk]
        assert np.allclose(out[:kk, :kk], ref), (off, kk, m_out)
        assert np.abs(out[kk:, :kk]).max() == 0 if kk < m_out else True
        if kk < m_out:
            mu = out[kk, kk]
            assert (np.diag(out)[kk:] == mu).all()
            assert mu > np.abs(np.linalg.eigvalsh(ref)).max()


def test_assemble_traced_k():
    from eigenkernel_tpu.ops.qdwh import _j_assemble

    rng = np.random.default_rng(12)
    m, k = 24, 10
    v = jnp.asarray(np.linalg.qr(rng.standard_normal((m, m)))[0])
    m1, m2 = 16, 16       # bucketed child sizes
    w1 = jnp.asarray(rng.standard_normal(m1))
    w2 = jnp.asarray(rng.standard_normal(m2))
    v1 = jnp.asarray(rng.standard_normal((m1, m1)))
    v2 = jnp.asarray(rng.standard_normal((m2, m2)))
    w, vout = _j_assemble(v, w1, v1, w2, v2, k, None)
    w, vout = np.asarray(w), np.asarray(vout)
    assert np.allclose(w[:k], np.asarray(w1)[:k])
    assert np.allclose(w[k:], np.asarray(w2)[:m - k])
    vc = np.zeros((m, m))
    vc[:k, :k] = np.asarray(v1)[:k, :k]
    vc[k:, k:] = np.asarray(v2)[:m - k, :m - k]
    assert np.allclose(vout, np.asarray(v) @ vc, atol=1e-12)
