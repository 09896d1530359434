"""Ozaki bf16-slice GEMM: f64-grade accuracy from MXU-exact products.

Validates the path that lets the mixed-precision refinement hit the
reference's 1e-12 residual bar on TPU (BASELINE.md; verifier.f90
accuracy model) without trusting the truncated emulated-f64 matmul.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from eigenkernel_tpu.ops import ozaki


@pytest.mark.parametrize("n,k", [(96, 96), (128, 64), (200, 300)])
def test_ozaki_matmul_accuracy(n, k):
    rng = np.random.default_rng(5)
    a = rng.standard_normal((n, k)) * np.exp(rng.standard_normal((n, k)) * 4)
    b = rng.standard_normal((k, n)) * 10.0 ** rng.integers(-6, 6, (k, n))
    ref = a @ b
    got = np.asarray(ozaki.ozaki_matmul(jnp.asarray(a), jnp.asarray(b)))
    err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    assert err < 5e-13


def test_ozaki_presplit_and_transpose_agree():
    rng = np.random.default_rng(6)
    a = rng.standard_normal((64, 96))
    v = rng.standard_normal((96, 32))
    op_a = ozaki.split_slices(jnp.asarray(a), 1)
    op_v = ozaki.split_slices(jnp.asarray(v), 0)
    c1 = np.asarray(ozaki.ozaki_matmul(op_a, op_v))
    assert np.max(np.abs(c1 - a @ v)) / np.max(np.abs(a @ v)) < 1e-13
    # transpose: (v^T a^T) == (a v)^T through the transposed operands
    # (same exact products, TwoSum accumulation order differs -> ~2^-48)
    c2 = np.asarray(ozaki.ozaki_matmul(ozaki.transpose_operand(op_v),
                                       ozaki.transpose_operand(op_a)))
    np.testing.assert_allclose(c2, c1.T, rtol=0,
                               atol=1e-13 * np.max(np.abs(c1)))


def test_ozaki_long_contraction_chunked():
    # contraction beyond the exact-accumulation chunk (4096 at beta=5)
    rng = np.random.default_rng(7)
    a = rng.standard_normal((8, 6000))
    b = rng.standard_normal((6000, 8))
    ref = a @ b
    got = np.asarray(ozaki.ozaki_matmul(jnp.asarray(a), jnp.asarray(b)))
    assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 1e-13


def test_ozaki_zero_rows_and_scales():
    a = np.zeros((16, 16))
    a[3, 4] = 1e20
    a[5, :] = 1e-20
    b = np.eye(16)
    got = np.asarray(ozaki.ozaki_matmul(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, a, rtol=1e-13, atol=0)


def test_refine_with_forced_ozaki_gemms(monkeypatch):
    """End-to-end: Newton refinement reaches ~f64 residual with the
    Ozaki GEMM path forced on (what the TPU mixed pipeline runs)."""
    monkeypatch.setenv("EK_REFINE_GEMM", "ozaki")
    from eigenkernel_tpu.ops.refine import refine_eigenpairs

    rng = np.random.default_rng(11)
    n = 128
    a = rng.standard_normal((n, n))
    a = (a + a.T) / 2
    # f32-quality starting vectors
    w32, v32 = np.linalg.eigh(a.astype(np.float32))
    lam, v = refine_eigenpairs(jnp.asarray(a), jnp.asarray(v32), steps=4)
    lam, v = np.asarray(lam), np.asarray(v)
    resid = np.max(np.abs(a @ v - v * lam[None, :])) / np.linalg.norm(a)
    orth = np.max(np.abs(v.T @ v - np.eye(n)))
    assert resid < 1e-12, resid
    assert orth < 1e-12, orth


def test_ozaki_mixed_beta_rejected():
    import jax.numpy as jnp
    import pytest

    from eigenkernel_tpu.ops import ozaki

    a = jnp.ones((8, 8), jnp.float64)
    oa = ozaki.split_slices(a, 1, q=4, beta=3)
    ob = ozaki.split_slices(a, 0, q=4, beta=5)
    with pytest.raises(ValueError, match="slice widths differ"):
        ozaki.ozaki_matmul(oa, ob)


def test_ozaki_matmul_chunked_accuracy():
    # scan-serialized per-chunk splitting (the n>8192 refine path) must
    # match the full-split product to ~eps64-per-chunk accumulation;
    # odd k exercises the zero-pad tail chunk
    import jax.numpy as jnp

    from eigenkernel_tpu.ops import ozaki

    rng = np.random.default_rng(3)
    a = rng.standard_normal((96, 130)) * np.exp(
        rng.standard_normal((96, 130)))
    b = rng.standard_normal((130, 80))
    ref = a @ b
    c = np.asarray(ozaki.ozaki_matmul_chunked(
        jnp.asarray(a), jnp.asarray(b), kc=64))
    err = np.abs(c - ref).max() / np.abs(ref).max()
    assert err < 1e-13, err
    # truncated expansion: coarser but still far below f32
    c8 = np.asarray(ozaki.ozaki_matmul_chunked(
        jnp.asarray(a), jnp.asarray(b), kc=64, max_diag=8))
    err8 = np.abs(c8 - ref).max() / np.abs(ref).max()
    assert err8 < 1e-9, err8
    # transpose_a: a.T @ b from (k, m)-shaped a, no materialized
    # transpose (the 16k refine-OOM fix)
    ct = np.asarray(ozaki.ozaki_matmul_chunked(
        jnp.asarray(a.T), jnp.asarray(b), kc=64, transpose_a=True))
    errt = np.abs(ct - ref).max() / np.abs(ref).max()
    assert errt < 1e-13, errt


def test_refine_big_path(monkeypatch):
    # the large-n chunked-ozaki refinement branch (forced small): must
    # reach the same 1e-12 bar as the hoisted-split path
    import jax.numpy as jnp

    from eigenkernel_tpu.ops.refine import refine_eigenpairs

    monkeypatch.setenv("EK_REFINE_GEMM", "ozaki")
    monkeypatch.setenv("EK_REFINE_CHUNK_MIN", "64")
    monkeypatch.setenv("EK_OZAKI_KC", "96")
    n = 160
    rng = np.random.default_rng(5)
    a = rng.standard_normal((n, n))
    a = (a + a.T) / 2
    w32, v32 = np.linalg.eigh(a.astype(np.float32))
    lam, v = refine_eigenpairs(jnp.asarray(a), jnp.asarray(v32))
    lam, v = np.asarray(lam), np.asarray(v)
    resid = np.max(np.abs(a @ v - v * lam[None, :])) / np.linalg.norm(a)
    orth = np.max(np.abs(v.T @ v - np.eye(n)))
    assert resid < 1e-12, resid
    # the 2-step big schedule trades a little orthogonality (probe:
    # ~5e-12) for ~3x less cost than the small-n 6-step default
    assert orth < 2e-11, orth


def test_refine_stepwise_matches_big(monkeypatch):
    # the host-stepped huge-n driver (refine_stepwise: one donated jit
    # per Newton step + jitted finalize, the n>8192 TPU memory fix) must
    # reach the same 1e-12 bar as the single-jit big branch
    import jax.numpy as jnp

    from eigenkernel_tpu.ops.refine import refine_stepwise, use_stepwise

    monkeypatch.setenv("EK_REFINE_STEPWISE", "1")
    monkeypatch.setenv("EK_OZAKI_KC", "96")
    assert use_stepwise(160)
    n = 160
    rng = np.random.default_rng(5)
    a = rng.standard_normal((n, n))
    a = (a + a.T) / 2
    w32, v32 = np.linalg.eigh(a.astype(np.float32))
    lam, v = refine_stepwise(jnp.asarray(a), jnp.asarray(v32))
    lam, v = np.asarray(lam), np.asarray(v)
    resid = np.max(np.abs(a @ v - v * lam[None, :])) / np.linalg.norm(a)
    orth = np.max(np.abs(v.T @ v - np.eye(n)))
    assert resid < 1e-12, resid
    assert orth < 2e-11, orth
    # generalized: B-orthonormal refinement through the same driver
    b = rng.standard_normal((n, n)) * 0.1
    b = b @ b.T + n * np.eye(n)
    from scipy.linalg import eigh as scipy_eigh
    wg, vg = scipy_eigh(a.astype(np.float32), b.astype(np.float32))
    lam, v = refine_stepwise(jnp.asarray(a), jnp.asarray(vg),
                             b=jnp.asarray(b))
    lam, v = np.asarray(lam), np.asarray(v)
    resid = np.max(np.abs(a @ v - (b @ v) * lam[None, :])) \
        / np.linalg.norm(a)
    assert resid < 1e-12, resid


def test_refine_stepwise_clustered(monkeypatch):
    # degenerate clusters force the auto cleanup decision OFF the skip
    # path: Newton freezes in-cluster rotations, the host gap check sees
    # gaps below the final threshold, and the (k,k) Jacobi cleanup must
    # still deliver the 1e-12 bar (this is the path the separated-spectrum
    # test above no longer exercises)
    import jax.numpy as jnp

    from eigenkernel_tpu.ops.refine import refine_stepwise

    monkeypatch.setenv("EK_REFINE_STEPWISE", "1")
    monkeypatch.setenv("EK_OZAKI_KC", "96")
    # force the cluster-limited cleanup to split the two engineered
    # clusters (widths 4 and 2) into separate groups — exercises the
    # multi-group write-back path the 16k hardware run relies on
    monkeypatch.setenv("EK_REFINE_CLUSTER_CAP", "4")
    n = 160
    rng = np.random.default_rng(11)
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    w = np.sort(rng.standard_normal(n))
    w[40:44] = w[40]          # exact 4-fold cluster
    w[100:102] = w[100] + 1e-13  # near-degenerate pair
    a = (q * w[None, :]) @ q.T
    a = (a + a.T) / 2
    _, v32 = np.linalg.eigh(a.astype(np.float32))
    lam, v = refine_stepwise(jnp.asarray(a), jnp.asarray(v32))
    lam, v = np.asarray(lam), np.asarray(v)
    resid = np.max(np.abs(a @ v - v * lam[None, :])) / np.linalg.norm(a)
    orth = np.max(np.abs(v.T @ v - np.eye(n)))
    assert resid < 1e-12, resid
    # in-cluster orth is ~2.6e-14 (probed) — the Jacobi cleanup does its
    # job; the overall max (~3.4e-11) sits at a MARGINAL-GAP random pair
    # outside the engineered clusters, the documented Newton noise floor
    # near the freeze threshold (refine.py contraction-aware tiny)
    assert orth < 1e-10, orth
    gram = v.T @ v - np.eye(n)
    assert np.abs(gram[40:44, 40:44]).max() < 1e-12
    assert np.abs(gram[100:102, 100:102]).max() < 1e-12
