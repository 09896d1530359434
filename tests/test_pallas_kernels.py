"""Pallas kernel tests (interpret mode on CPU; compiled paths are exercised
on real TPU by bench.py)."""

import jax.numpy as jnp
import numpy as np
import scipy.linalg as sla

from eigenkernel_tpu.ops.pallas_sturm import sturm_bisect
from eigenkernel_tpu.ops.tridiag import gershgorin_bounds


def _rand_tridiag(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(n), rng.standard_normal(n - 1)


def test_sturm_bisect_full():
    n = 200
    d, e = _rand_tridiag(n)
    ref = sla.eigvalsh_tridiagonal(d, e)
    lo, hi = gershgorin_bounds(jnp.asarray(d), jnp.asarray(e))
    lam = sturm_bisect(jnp.asarray(d), jnp.asarray(e), jnp.arange(n),
                       lo, hi, interpret=True)
    assert np.abs(np.array(lam) - ref).max() < 1e-11


def test_sturm_bisect_subset_and_f32():
    n = 150
    d, e = _rand_tridiag(n, seed=3)
    ref = sla.eigvalsh_tridiagonal(d, e)
    lo, hi = gershgorin_bounds(jnp.asarray(d), jnp.asarray(e))
    lam = sturm_bisect(jnp.asarray(d), jnp.asarray(e), jnp.arange(9),
                       lo, hi, interpret=True)
    assert np.abs(np.array(lam) - ref[:9]).max() < 1e-11
    lam32 = sturm_bisect(jnp.asarray(d, jnp.float32),
                         jnp.asarray(e, jnp.float32), jnp.arange(n),
                         lo, hi, interpret=True)
    assert np.abs(np.array(lam32) - ref).max() < 1e-4


def test_sturm_bisect_degenerate():
    d = np.concatenate([np.full(30, 1.5), np.linspace(2, 3, 30)])
    e = np.zeros(59)
    ref = np.sort(d)
    lo, hi = gershgorin_bounds(jnp.asarray(d), jnp.asarray(e))
    lam = sturm_bisect(jnp.asarray(d), jnp.asarray(e), jnp.arange(60),
                       lo, hi, interpret=True)
    assert np.abs(np.array(lam) - ref).max() < 1e-12


def test_tridiag_solve_pallas():
    from eigenkernel_tpu.ops.householder import tridiag_matrix
    from eigenkernel_tpu.ops.pallas_solve import tridiag_solve_pallas

    rng = np.random.default_rng(1)
    n, k = 300, 20
    d = jnp.asarray(rng.standard_normal(n))
    e = jnp.asarray(rng.standard_normal(n - 1))
    lam = jnp.asarray(rng.standard_normal(k) * 0.1)
    b = jnp.asarray(rng.standard_normal((n, k)))
    x = np.array(tridiag_solve_pallas(d, e, lam, b, interpret=True))
    T = np.array(tridiag_matrix(d, e))
    for j in range(k):
        r = (T - float(lam[j]) * np.eye(n)) @ x[:, j] - np.array(b)[:, j]
        assert np.abs(r).max() < 1e-9


def test_apply_chase_q_pallas():
    from eigenkernel_tpu.ops.bulge import apply_chase_q, band_to_tridiag
    from eigenkernel_tpu.ops.pallas_backtransform import apply_chase_q_pallas

    rng = np.random.default_rng(2)
    n, bw = 96, 8
    A = rng.standard_normal((n, n))
    A = (A + A.T) / 2
    i, j = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    A = np.where(np.abs(i - j) <= bw, A, 0.0)
    res = band_to_tridiag(jnp.asarray(A), bw)
    z = jnp.asarray(rng.standard_normal((n, 33)))
    ref = np.array(apply_chase_q(res, z, bw))
    out = np.array(apply_chase_q_pallas(res.HV, res.HT, z, bw,
                                        interpret=True))
    assert np.abs(out - ref).max() < 1e-13


def test_apply_chase_q_pallas_production_shape():
    # bw=128-multiple lane-aligned shape (the hardware-supported regime)
    # with T+1 NOT a multiple of 8, exercising the tp zero-row padding
    from eigenkernel_tpu.ops.bulge import apply_chase_q, band_to_tridiag
    from eigenkernel_tpu.ops.pallas_backtransform import apply_chase_q_pallas

    rng = np.random.default_rng(5)
    n, bw = 384, 128
    A = rng.standard_normal((n, n))
    A = (A + A.T) / 2
    i, j = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    A = np.where(np.abs(i - j) <= bw, A, 0.0)
    res = band_to_tridiag(jnp.asarray(A), bw)
    z = jnp.asarray(rng.standard_normal((n, 17)))
    ref = np.array(apply_chase_q(res, z, bw))
    out = np.array(apply_chase_q_pallas(res.HV, res.HT, z, bw,
                                        interpret=True))
    assert np.abs(out - ref).max() < 1e-12


def test_pallas_chase_matches_wavefront2():
    # the VMEM-resident chase runs the same schedule/arithmetic as
    # wavefront2, but its shear-network face extraction changes XLA's
    # fusion of the f32 reductions, so values drift by ~ulp per step and
    # the accumulated elementwise difference is NOT a stable invariant
    # (any upstream rounding change — e.g. the concatenated to_band
    # rank-2b GEMM — reshuffles it; a near-zero pivot can even flip
    # reflector signs legitimately).  The real invariant is the spectrum
    # of the produced tridiagonal vs the banded input.
    from eigenkernel_tpu.ops.band import to_band
    from eigenkernel_tpu.ops.bulge import band_to_tridiag_wavefront2
    from eigenkernel_tpu.ops.pallas_chase import band_to_tridiag_pallas

    rng = np.random.default_rng(0)
    n, bw = 192, 8
    A = rng.standard_normal((n, n)).astype(np.float32)
    A = (A + A.T) / 2
    br = to_band(jnp.asarray(A), bw=bw)
    ref = band_to_tridiag_wavefront2(br.band, bw)
    got = band_to_tridiag_pallas(br.band, bw, interpret=True)
    # first rows agree before drift accumulates (same schedule)
    assert np.abs(np.asarray(ref.d)[:16] - np.asarray(got.d)[:16]).max() \
        < 1e-5
    # spectrum check: eigvals of tridiag(d, e) == eigvals of banded A
    lam_band = np.linalg.eigvalsh(np.asarray(br.band, np.float64))
    Tm = (np.diag(np.asarray(got.d, np.float64))
          + np.diag(np.asarray(got.e, np.float64), 1)
          + np.diag(np.asarray(got.e, np.float64), -1))
    lam_tri = np.linalg.eigvalsh(Tm)
    scale = np.abs(lam_band).max()
    assert np.abs(lam_tri - lam_band).max() < 5e-5 * scale


def test_pallas_chase_small_state_clamped(monkeypatch):
    # small-state mode (n=16384-class VMEM fit): live range only, dead
    # lanes clamp into the state tail with identity write-backs
    from eigenkernel_tpu.ops.band import to_band
    from eigenkernel_tpu.ops.bulge import band_to_tridiag_wavefront2
    from eigenkernel_tpu.ops.pallas_chase import band_to_tridiag_pallas

    monkeypatch.setenv("EK_PALLAS_CHASE_SMALL", "1")
    rng = np.random.default_rng(5)
    n, bw = 192, 8
    A = rng.standard_normal((n, n)).astype(np.float32)
    A = (A + A.T) / 2
    br = to_band(jnp.asarray(A), bw=bw)
    ref = band_to_tridiag_wavefront2(br.band, bw)
    got = band_to_tridiag_pallas(br.band, bw, interpret=True)
    # same group partition + same arithmetic as the full-state lane-IO
    # form => identical reflectors; compare directly at f32 drift level
    assert np.abs(np.asarray(ref.d) - np.asarray(got.d)).max() < 2e-3
    lam_band = np.linalg.eigvalsh(np.asarray(br.band, np.float64))
    Tm = (np.diag(np.asarray(got.d, np.float64))
          + np.diag(np.asarray(got.e, np.float64), 1)
          + np.diag(np.asarray(got.e, np.float64), -1))
    lam_tri = np.linalg.eigvalsh(Tm)
    assert (np.abs(lam_tri - lam_band).max()
            < 5e-5 * np.abs(lam_band).max())


def test_pallas_chase_ragged_lane_groups(monkeypatch):
    # lane-group processing (scoped-VMEM bound): a group size that does
    # not divide nW exercises the ragged last group + group loop
    from eigenkernel_tpu.ops.band import to_band
    from eigenkernel_tpu.ops.pallas_chase import band_to_tridiag_pallas

    monkeypatch.setenv("EK_PALLAS_CHASE_GROUP", "3")
    rng = np.random.default_rng(3)
    n, bw = 96, 8
    A = rng.standard_normal((n, n)).astype(np.float32)
    A = (A + A.T) / 2
    br = to_band(jnp.asarray(A), bw=bw)
    got = band_to_tridiag_pallas(br.band, bw, interpret=True)
    lam_band = np.linalg.eigvalsh(np.asarray(br.band, np.float64))
    Tm = (np.diag(np.asarray(got.d, np.float64))
          + np.diag(np.asarray(got.e, np.float64), 1)
          + np.diag(np.asarray(got.e, np.float64), -1))
    lam_tri = np.linalg.eigvalsh(Tm)
    scale = np.abs(lam_band).max()
    assert np.abs(lam_tri - lam_band).max() < 5e-5 * scale


def test_pallas_chase_aligned_covers_bitexact(monkeypatch):
    # tile-aligned cover IO (EK_PALLAS_CHASE_ALIGN): state as
    # (tiles, 8, Wp), residual 0..7 offset applied via masked sublane
    # rolls — must be BIT-identical to the default lane IO (same
    # per-lane arithmetic, only the IO framing differs)
    from eigenkernel_tpu.ops.band import to_band
    from eigenkernel_tpu.ops.pallas_chase import band_to_tridiag_pallas

    rng = np.random.default_rng(3)
    n, bw = 256, 8
    A = rng.standard_normal((n, n)).astype(np.float32)
    A = (A + A.T) / 2
    br = to_band(jnp.asarray(A), bw=bw)
    monkeypatch.setenv("EK_PALLAS_CHASE_ALIGN", "0")  # lane IO reference
    ref = band_to_tridiag_pallas(br.band, bw, interpret=True)
    monkeypatch.setenv("EK_PALLAS_CHASE_ALIGN", "1")
    got = band_to_tridiag_pallas(br.band, bw, interpret=True)
    assert np.array_equal(np.asarray(ref.d), np.asarray(got.d))
    assert np.array_equal(np.asarray(ref.e), np.asarray(got.e))
    assert np.array_equal(np.asarray(ref.HV), np.asarray(got.HV))
    assert np.array_equal(np.asarray(ref.HT), np.asarray(got.HT))


def test_pallas_chase_vmem_budget_fallback(monkeypatch):
    # EK_PALLAS_CHASE_VMEM=0 forces the beyond-VMEM dispatcher path:
    # the call must route to the XLA wavefront2 (no pallas_call) and
    # still be correct
    from eigenkernel_tpu.ops.band import to_band
    from eigenkernel_tpu.ops.bulge import band_to_tridiag_wavefront2
    from eigenkernel_tpu.ops.pallas_chase import band_to_tridiag_pallas

    rng = np.random.default_rng(5)
    n, bw = 128, 8
    A = rng.standard_normal((n, n)).astype(np.float32)
    A = (A + A.T) / 2
    br = to_band(jnp.asarray(A), bw=bw)
    monkeypatch.setenv("EK_PALLAS_CHASE_VMEM", "0")
    got = band_to_tridiag_pallas(br.band, bw, interpret=False)
    ref = band_to_tridiag_wavefront2(br.band, bw)
    assert np.array_equal(np.asarray(ref.d), np.asarray(got.d))
    assert np.array_equal(np.asarray(ref.e), np.asarray(got.e))


def test_pallas_chase_shear_roll_mode(monkeypatch):
    # EK_PALLAS_CHASE_SHEAR=roll replaces the log2(b) masked-roll shear
    # network with one strided hardware rotate per half
    # (tpu.DynamicRotate).  Bit-identical at bw=8; at bw=32 XLA fuses
    # the downstream f32 reductions differently around the primitive
    # (ulp drift, same phenomenon as net-vs-wavefront2), so the bw=32
    # case is validated by spectrum.
    from eigenkernel_tpu.ops.band import to_band
    from eigenkernel_tpu.ops.pallas_chase import band_to_tridiag_pallas

    rng = np.random.default_rng(3)
    n, bw = 192, 8
    A = rng.standard_normal((n, n)).astype(np.float32)
    A = (A + A.T) / 2
    br = to_band(jnp.asarray(A), bw=bw)
    ref = band_to_tridiag_pallas(br.band, bw, interpret=True)
    monkeypatch.setenv("EK_PALLAS_CHASE_SHEAR", "roll")
    got = band_to_tridiag_pallas(br.band, bw, interpret=True)
    assert np.array_equal(np.asarray(ref.d), np.asarray(got.d))
    assert np.array_equal(np.asarray(ref.e), np.asarray(got.e))
    assert np.array_equal(np.asarray(ref.HV), np.asarray(got.HV))

    n, bw = 256, 32
    A = rng.standard_normal((n, n)).astype(np.float32)
    A = (A + A.T) / 2
    br = to_band(jnp.asarray(A), bw=bw)
    got = band_to_tridiag_pallas(br.band, bw, interpret=True)
    lam_band = np.linalg.eigvalsh(np.asarray(br.band, np.float64))
    d = np.asarray(got.d, np.float64)
    e = np.asarray(got.e, np.float64)
    lam = np.linalg.eigvalsh(np.diag(d) + np.diag(e, 1) + np.diag(e, -1))
    scale = np.abs(lam_band).max()
    assert np.abs(lam - lam_band).max() < 5e-5 * scale
