"""WY-grouped stage-2 back-transform vs the per-sweep reference path."""

import numpy as np
import pytest

import jax.numpy as jnp

from eigenkernel_tpu.ops import bulge


@pytest.mark.parametrize("n,bw,g", [(96, 8, 4), (130, 16, 16), (64, 4, 3),
                                    (157, 8, 5)])
def test_blocked_matches_unblocked(n, bw, g):
    rng = np.random.default_rng(n + bw)
    a = rng.standard_normal((n, n))
    a = a + a.T
    band = np.triu(np.tril(a, bw), -bw)
    res = bulge.band_to_tridiag(jnp.asarray(band), bw=bw)
    z = rng.standard_normal((n, max(4, n // 3)))
    z1 = np.asarray(bulge.apply_chase_q(res, jnp.asarray(z), bw=bw))
    z2 = np.asarray(bulge.apply_chase_q_blocked(res, jnp.asarray(z),
                                                bw=bw, group=g))
    assert np.abs(z1 - z2).max() < 1e-13


@pytest.mark.parametrize("n,bw,g", [(96, 8, 4), (130, 16, 16), (64, 4, 3),
                                    (157, 8, 5), (96, 8, 32), (192, 8, 40),
                                    (256, 8, 94)])
def test_wavefront_matches_unblocked(n, bw, g):
    # group-wavefront batched form: T+nG covering-slice steps, exact.
    # Unlike the blocked path, g > bw is VALID here (order-preservation
    # proof in the op docstring) — the g=32/40/94 cases exercise it,
    # including the multi-plane _wy_embed.
    rng = np.random.default_rng(n + bw)
    a = rng.standard_normal((n, n))
    a = a + a.T
    band = np.triu(np.tril(a, bw), -bw)
    res = bulge.band_to_tridiag(jnp.asarray(band), bw=bw)
    z = rng.standard_normal((n, max(4, n // 3)))
    z1 = np.asarray(bulge.apply_chase_q(res, jnp.asarray(z), bw=bw))
    z2 = np.asarray(bulge.apply_chase_q_wavefront(res, jnp.asarray(z),
                                                  bw=bw, group=g))
    assert np.abs(z1 - z2).max() < 1e-13


@pytest.mark.parametrize("n,bw,g", [(160, 32, 32), (224, 32, 64),
                                    (130, 16, 32), (296, 32, 96),
                                    (256, 64, 64)])
def test_wavefront_pallas_matches_unblocked(n, bw, g):
    # VMEM-tile pallas kernel (interpret mode): hoisted P-stream window
    # transforms, 8-aligned dynamic-row window loads, dead-lane
    # clamping to the shared identity row
    from eigenkernel_tpu.ops.pallas_wf_bt import (
        apply_chase_q_wavefront_pallas)

    rng = np.random.default_rng(n + bw)
    a = rng.standard_normal((n, n)).astype(np.float32)
    a = a + a.T
    band = np.triu(np.tril(a, bw), -bw)
    res = bulge.band_to_tridiag(jnp.asarray(band), bw=bw)
    z = rng.standard_normal((n, 70)).astype(np.float32)
    z1 = np.asarray(bulge.apply_chase_q(res, jnp.asarray(z), bw=bw))
    z2 = np.asarray(apply_chase_q_wavefront_pallas(
        res, jnp.asarray(z), bw=bw, group=g, interpret=True))
    scale = max(np.abs(z1).max(), 1.0)
    assert np.abs(z1 - z2).max() / scale < 5e-6


@pytest.mark.parametrize("n,bw,g,m", [(224, 32, 64, 1), (224, 32, 64, 2),
                                      (296, 32, 64, 6), (256, 16, 48, 3),
                                      (160, 32, 32, 4)])
def test_wavefront_pallas_composite_m(n, bw, g, m, monkeypatch):
    # composite-m window fusion: m consecutive band positions of each
    # group composed into one (g+m*b)-row transform (S2=256 two-tile
    # cases included), vs the unblocked ground truth; also the
    # full-range (non-live) lane loop with liveness clamping
    from eigenkernel_tpu.ops.pallas_wf_bt import (
        apply_chase_q_wavefront_pallas)

    monkeypatch.setenv("EK_WF_BT_M", str(m))
    rng = np.random.default_rng(n + bw + m)
    a = rng.standard_normal((n, n)).astype(np.float32)
    a = a + a.T
    band = np.triu(np.tril(a, bw), -bw)
    res = bulge.band_to_tridiag(jnp.asarray(band), bw=bw)
    z = rng.standard_normal((n, 70)).astype(np.float32)
    z1 = np.asarray(bulge.apply_chase_q(res, jnp.asarray(z), bw=bw))
    z2 = np.asarray(apply_chase_q_wavefront_pallas(
        res, jnp.asarray(z), bw=bw, group=g, interpret=True))
    scale = max(np.abs(z1).max(), 1.0)
    assert np.abs(z1 - z2).max() / scale < 5e-6
    monkeypatch.setenv("EK_WF_BT_LIVE", "0")
    z3 = np.asarray(apply_chase_q_wavefront_pallas(
        res, jnp.asarray(z), bw=bw, group=g, interpret=True))
    assert np.abs(z1 - z3).max() / scale < 5e-6


def test_wavefront_pallas_multiphase(monkeypatch):
    # force the tau-range phasing (the n=16384 HBM path): a tiny stream
    # budget splits the P stream into several build+apply phases, which
    # must compose to the same Q2 as the single-phase run
    from eigenkernel_tpu.ops.pallas_wf_bt import (
        apply_chase_q_wavefront_pallas)

    n, bw, g = 224, 32, 64
    rng = np.random.default_rng(7)
    a = rng.standard_normal((n, n)).astype(np.float32)
    a = a + a.T
    band = np.triu(np.tril(a, bw), -bw)
    res = bulge.band_to_tridiag(jnp.asarray(band), bw=bw)
    z = rng.standard_normal((n, 40)).astype(np.float32)
    z1 = np.asarray(apply_chase_q_wavefront_pallas(
        res, jnp.asarray(z), bw=bw, group=g, interpret=True))
    monkeypatch.setenv("EK_WF_BT_STREAM", "300000")   # forces ~4 phases
    z2 = np.asarray(apply_chase_q_wavefront_pallas(
        res, jnp.asarray(z), bw=bw, group=g, interpret=True))
    assert np.abs(z1 - z2).max() < 1e-5


def test_wavefront_two_stage_pipeline(monkeypatch):
    # end-to-end with the wavefront back-transform + column chunking
    monkeypatch.setenv("EK_BACKTRANSFORM", "wavefront")
    monkeypatch.setenv("EK_BT_KCHUNK", "2")
    from eigenkernel_tpu.solvers.api import solve
    rng = np.random.default_rng(11)
    n = 96
    a = rng.standard_normal((n, n))
    a = a + a.T
    p = solve(a, solver="eigensx", block_size=8)
    w_ref = np.linalg.eigvalsh(a)
    assert np.abs(np.asarray(p.values) - w_ref).max() < 1e-10
    v = np.asarray(p.vectors)
    r = a @ v - v * np.asarray(p.values)[None, :]
    assert np.abs(r).max() / np.linalg.norm(a) < 1e-12


def test_blocked_two_stage_pipeline(monkeypatch):
    # end-to-end general_elpa2 with the blocked back-transform default
    monkeypatch.setenv("EK_BACKTRANSFORM", "blocked")
    from eigenkernel_tpu.solvers.api import solve
    rng = np.random.default_rng(9)
    n = 96
    a = rng.standard_normal((n, n))
    a = a + a.T
    l = rng.standard_normal((n, n)) * 0.1
    b = l @ l.T + n * np.eye(n)
    p = solve(a, b, solver="general_elpa2", block_size=8)
    import scipy.linalg as sla
    w_ref = sla.eigh(a, b, eigvals_only=True)
    assert np.abs(np.asarray(p.values) - w_ref).max() < 1e-10
    v = np.asarray(p.vectors)
    r = a @ v - b @ v * np.asarray(p.values)[None, :]
    assert np.abs(r).max() / np.linalg.norm(a) < 1e-12
