"""Tests for the divide & conquer tridiagonal core (pdstedc analog).

Covers: random spectra at leaf/padded/multi-level sizes, exactly-degenerate
clusters (type-2 deflation), Wilkinson tight pairs, near-decoupled and
zero matrices, float32, selecting-path agreement, and the EK_TRIDIAG=dc
pipeline default.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eigenkernel_tpu.ops.dc import tridiag_dc
from eigenkernel_tpu.ops.tridiag import tridiag_eigh


def _check(d, e, tol=5e-13):
    n = len(d)
    t = np.diag(d)
    if n > 1:
        t = t + np.diag(e, 1) + np.diag(e, -1)
    w_ref = np.linalg.eigvalsh(t)
    w, q = jax.jit(tridiag_dc)(jnp.asarray(d), jnp.asarray(e))
    w, q = np.asarray(w), np.asarray(q)
    scale = max(np.abs(w_ref).max(), 1.0)
    assert np.abs(w - w_ref).max() / scale < tol
    assert np.abs(t @ q - q * w[None, :]).max() / scale < tol
    assert np.abs(q.T @ q - np.eye(n)).max() < 1e-13


@pytest.mark.parametrize("n", [3, 17, 64, 65, 130, 300])
def test_dc_random(n):
    rng = np.random.default_rng(n)
    _check(rng.standard_normal(n),
           rng.standard_normal(n - 1) if n > 1 else np.zeros(0))


def test_dc_degenerate_clusters():
    # exactly repeated eigenvalues: exercises type-2 (Givens) deflation
    rng = np.random.default_rng(7)
    n = 128
    w_deg = np.repeat(np.arange(n // 4), 4).astype(float)
    qr, _ = np.linalg.qr(rng.standard_normal((n, n)))
    a = (qr * w_deg[None, :]) @ qr.T
    import scipy.linalg as sla
    td = sla.hessenberg(a)
    _check(np.diag(td), np.diag(td, -1))


def test_dc_wilkinson():
    n = 201
    k = np.abs(np.arange(n) - n // 2).astype(float)
    _check(k, np.ones(n - 1))


def test_dc_adversarial():
    rng = np.random.default_rng(17)
    # glued Wilkinson: many near-double pairs across merge boundaries
    blocks = 6
    k = np.abs(np.arange(21) - 10).astype(float)
    d = np.tile(k, blocks)
    e = np.ones(21 * blocks - 1)
    e[20::21] = 1e-8
    _check(d, e)
    # alternating tiny/large couplings
    d = rng.standard_normal(300)
    e = np.where(np.arange(299) % 2 == 0, 1e-13, 1.0) \
        * rng.standard_normal(299)
    _check(d, e)
    # 16-decade scale gradient across merges
    d = np.concatenate([rng.standard_normal(96) * 1e8,
                        rng.standard_normal(96),
                        rng.standard_normal(96) * 1e-8])
    _check(d, rng.standard_normal(287))


def test_dc_edge_cases():
    _check(np.zeros(100), np.zeros(99))           # zero matrix
    _check(np.ones(96), np.zeros(95))             # fully deflated
    rng = np.random.default_rng(3)
    _check(rng.standard_normal(200),
           1e-14 * rng.standard_normal(199))      # near-decoupled


def test_dc_float32():
    rng = np.random.default_rng(5)
    n = 96
    d = rng.standard_normal(n).astype(np.float32)
    e = rng.standard_normal(n - 1).astype(np.float32)
    t = np.diag(d) + np.diag(e, 1) + np.diag(e, -1)
    w_ref = np.linalg.eigvalsh(t.astype(np.float64))
    w, q = jax.jit(tridiag_dc)(jnp.asarray(d), jnp.asarray(e))
    w, q = np.asarray(w), np.asarray(q)
    scale = np.abs(w_ref).max()
    assert np.abs(w - w_ref).max() / scale < 5e-5
    assert np.abs(q.T @ q - np.eye(n)).max() < 5e-6


def test_tridiag_eigh_dc_default(monkeypatch):
    # full-spectrum tridiag_eigh auto-selects the D&C core and matches it
    monkeypatch.delenv("EK_TRIDIAG", raising=False)
    rng = np.random.default_rng(11)
    n = 120
    d, e = rng.standard_normal(n), rng.standard_normal(n - 1)
    w, z = tridiag_eigh(jnp.asarray(d), jnp.asarray(e))
    w_dc, z_dc = tridiag_dc(jnp.asarray(d), jnp.asarray(e))
    assert np.abs(np.asarray(w) - np.asarray(w_dc)).max() == 0
    assert np.abs(np.asarray(z) - np.asarray(z_dc)).max() == 0


def test_tridiag_eigh_selecting_stays_bisect():
    # the selecting path (small n_vec) matches D&C eigenvalues
    rng = np.random.default_rng(13)
    n = 150
    d, e = rng.standard_normal(n), rng.standard_normal(n - 1)
    w_sel, z_sel = tridiag_eigh(jnp.asarray(d), jnp.asarray(e), n_vec=10)
    w_dc, _ = tridiag_dc(jnp.asarray(d), jnp.asarray(e))
    assert np.abs(np.asarray(w_sel) - np.asarray(w_dc)[:10]).max() < 1e-12
    t = np.diag(d) + np.diag(e, 1) + np.diag(e, -1)
    z = np.asarray(z_sel)
    r = t @ z - z * np.asarray(w_sel)[None, :]
    assert np.abs(r).max() < 1e-11
