"""Two-stage reduction, stage 1: full -> symmetric band matrix.

TPU-native analog of the first stage of ELPA2's two-stage solver and
EigenExa's ``eigen_sx`` pentadiagonalization (solver_elpa.f90:448,
solver_eigenexa.f90:121-135): the dense matrix is reduced to a band matrix
of semibandwidth ``bw`` using blocked Householder QR panels, so *all* O(n^3)
work is two-sided compact-WY GEMM updates — no memory-bound matvecs (the
reason two-stage beats one-stage on accelerators).

Uniform schedule (single ``fori_loop``, see ops/blocked.py design note):
per panel s, the subdiagonal block column ``A[s+bw:, s:s+bw]`` is
QR-factored with masked full-height reflectors (V has support only on rows
>= s+bw), and ONE masked full-size symmetric WY update

    u = (A V) T - V (T^T (V^T A V) T) / 2,      A <- A - u V^T - V u^T

applies the complete two-sided transform ``diag(I, Q)^T A diag(I, Q)``:
because V vanishes above s+bw, this simultaneously produces R in the panel
(band) block, transforms the trailing block, and leaves finished rows
untouched.  A final band mask clears the eliminated entries' roundoff.

Stage 2 (band -> tridiagonal) is the bulge-chasing kernel in ops/bulge.py;
the pipeline composition lives in solvers/twostage.py.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh

from eigenkernel_tpu.ops.blocked import _wsc
from eigenkernel_tpu.ops.householder import wy_t_factor


class BandResult(NamedTuple):
    band: jax.Array   # (n, n) symmetric band matrix (semibandwidth bw)
    V: jax.Array      # (n, n) stage-1 Householder vectors, panel layout
    taus: jax.Array   # (n,)
    bw: jax.Array     # scalar (static int at trace time)


def _qr_panel(p: jax.Array, pivot0, b: int):
    """Householder QR of the rows >= pivot0 of full-height block ``p``
    (n x b), with masked sequential columns.

    Column j's reflector has its unit pivot at row ``pivot0 + j`` and zeros
    above.  Returns (V, taus); ``p``'s R factor is not needed by callers
    (the uniform WY update regenerates it).

    Two loop-state layouts, EK_QR_PANEL selects (default ``n``):

    * ``n``: (n, b) carry — the r1-r4s3 form.  Hardware-measured to_band
      at 8192/16384: 0.354 / 1.755 s (evidence/SWEEP_r5.md).
    * ``t``: TRANSPOSED (b, n) carry — meant to avoid lane-padding
      b -> 128, but the first dedicated timings read 1.604 / 11.18 s —
      a 4.5-6.4x REGRESSION (the dynamic sublane-offset (1, n) row
      slice + per-panel transposes lower far worse than the padded
      lane reads).  Kept only for A/B.
    """
    import os

    n = p.shape[0]
    dtype = p.dtype
    transposed = os.environ.get("EK_QR_PANEL", "n") == "t"
    cols = lax.broadcasted_iota(jnp.int32, (n,), 0)

    def _reflector(x, piv):
        tail = jnp.where(cols > piv, x, 0.0)
        alpha = lax.dynamic_slice(x, (jnp.minimum(piv, n - 1),), (1,))[0]
        sigma = jnp.sum(tail * tail)
        zero_tail = sigma == 0
        sgn = jnp.where(alpha >= 0, 1.0, -1.0).astype(dtype)
        beta = jnp.where(zero_tail, alpha,
                         -sgn * jnp.sqrt(alpha * alpha + sigma))
        denom = jnp.where(zero_tail, 1.0, alpha - beta).astype(dtype)
        live = jnp.logical_and(jnp.logical_not(zero_tail),
                               piv < n).astype(dtype)
        v = live * (tail / denom + (cols == piv).astype(dtype))
        tau = live * jnp.where(zero_tail, 0.0,
                               (beta - alpha) /
                               jnp.where(beta == 0, 1.0, beta))
        return v, tau

    if transposed:
        def step_t(j, carry):
            pt, Vt, taus = carry
            v, tau = _reflector(lax.dynamic_slice(pt, (j, 0), (1, n))[0],
                                pivot0 + j)
            w = pt @ v                               # (b,)
            pt = pt - tau * w[:, None] * v[None, :]
            Vt = lax.dynamic_update_slice(Vt, v[None, :], (j, 0))
            return (pt, Vt, taus.at[j].set(tau))

        _, Vt, taus = lax.fori_loop(
            0, b, step_t, (p.T, jnp.zeros((b, n), dtype),
                           jnp.zeros((b,), dtype)))
        return Vt.T, taus

    def step(j, carry):
        p, V, taus = carry
        v, tau = _reflector(lax.dynamic_slice(p, (0, j), (n, 1))[:, 0],
                            pivot0 + j)
        p = p - tau * jnp.outer(v, v @ p)
        V = lax.dynamic_update_slice(V, v[:, None], (0, j))
        return (p, V, taus.at[j].set(tau))

    _, V, taus = lax.fori_loop(
        0, b, step, (p, jnp.zeros((n, b), dtype), jnp.zeros((b,), dtype)))
    return V, taus


def to_band(a: jax.Array, bw: int,
            mesh: Optional[Mesh] = None) -> BandResult:
    """Reduce symmetric ``a`` to a band matrix: ``A_band = Q^T A Q``.

    Bucketed schedule: first-half panels at full size, then recursion on
    the exact trailing half (panel reflectors only touch rows/cols >= s,
    so the trailing subproblem is self-contained) — O(log n) compiled
    shapes, near-optimal flops.
    """
    import os

    n = a.shape[0]
    dtype = a.dtype
    if n % bw != 0:
        raise ValueError(f"dim {n} not divisible by bandwidth {bw}")
    # split granularity (same scheme as ops/householder.py sytrd): the
    # trailing GEMMs run at the full bucket size, so traffic is
    # coef(s) * n^3*4/bw bytes with coef(2)=1.71, coef(4)=1.30,
    # coef(8)=1.14 — finer splits close most of the measured 27%-of-
    # roofline gap at n=16384 (r3 verdict weak #3) for O(split*log)
    # compiled shapes.
    split = int(os.environ.get("EK_TOBAND_SPLIT", "8"))
    a, vstore, taus = _to_band_rec(_wsc(a, mesh), bw, mesh, split)

    # clear the eliminated entries' roundoff outside the band
    idx = jnp.arange(n)
    mask = jnp.abs(idx[:, None] - idx[None, :]) <= bw
    band = jnp.where(mask, a, 0.0)
    band = (band + band.T) * jnp.asarray(0.5, dtype)
    return BandResult(band=band, V=vstore, taus=taus,
                      bw=jnp.asarray(bw, jnp.int32))


def _to_band_rec(a: jax.Array, bw: int, mesh: Optional[Mesh],
                 split: int = 2):
    m = a.shape[0]
    mid = (m // max(split, 2) // bw) * bw
    if mid == 0 or m - mid < 2 * bw:
        return _to_band_panels(a, bw, mesh, max(m // bw - 1, 0))
    a, V1, t1 = _to_band_panels(a, bw, mesh, mid // bw)
    a2, V2, t2 = _to_band_rec(a[mid:, mid:], bw, mesh, split)
    a = a.at[mid:, mid:].set(a2)
    V = jnp.zeros((m, m), a.dtype)
    V = V.at[:, :mid].set(V1[:, :mid])
    V = V.at[mid:, mid:].set(V2)
    taus = jnp.concatenate([t1[:mid], t2])
    return _wsc(a, mesh), _wsc(V, mesh), taus


def _to_band_panels(a: jax.Array, bw: int, mesh: Optional[Mesh],
                    n_panels: int):
    """Run ``n_panels`` leading band-reduction panels on the full matrix."""
    n = a.shape[0]
    dtype = a.dtype

    def step(k, carry):
        a, vstore, taus = carry
        s = k * bw
        colblk = lax.dynamic_slice(a, (0, s), (n, bw))
        V, tau_p = _qr_panel(colblk, s + bw, bw)
        t = wy_t_factor(V, tau_p)
        av = a @ V
        w = av @ t
        mmat = t.T @ (V.T @ av) @ t
        u = w - 0.5 * (V @ mmat)
        # one concatenated rank-2b GEMM: u V^T + V u^T = [u V] [V u]^T —
        # a single read+write pass over the trailing matrix instead of
        # two (to_band is HBM-bound; its panel QR never touches a)
        uv = jnp.concatenate([u, V], axis=1)
        vu = jnp.concatenate([V, u], axis=1)
        a = _wsc(a - uv @ vu.T, mesh)
        vstore = lax.dynamic_update_slice(vstore, V, (0, s))
        taus = lax.dynamic_update_slice(taus, tau_p, (s,))
        return (a, vstore, taus)

    v0 = jnp.zeros((n, n), dtype)
    t0 = jnp.zeros((n,), dtype)
    return lax.fori_loop(0, n_panels, step, (a, v0, t0))


def apply_band_q(res: BandResult, z: jax.Array, bw: int,
                 mesh: Optional[Mesh] = None,
                 transpose: bool = False, group: int = 0) -> jax.Array:
    """``z <- Q z`` with Q the stage-1 band-reduction transform.

    WY groups of ``group`` consecutive panels per z pass (exact — see
    ops/householder.py::apply_q).  The unfilled last panel slot of the
    V store is all-zero with tau = 0, i.e. identity reflectors, so the
    grouping runs over the round ``nb = n/bw`` panel count.
    """
    from eigenkernel_tpu.ops.householder import _wy_group_size

    n = res.V.shape[0]
    nb = n // bw
    if nb <= 1:
        return z
    g = _wy_group_size(nb, bw, group)
    gb = g * bw
    ng = nb // g

    def step(i, z):
        p = i if transpose else ng - 1 - i
        s = p * gb
        v = lax.dynamic_slice(res.V, (0, s), (n, gb))
        tau_p = lax.dynamic_slice(res.taus, (s,), (gb,))
        t = wy_t_factor(v, tau_p)
        t = t.T if transpose else t
        return _wsc(z - v @ (t @ (v.T @ z)), mesh)

    return lax.fori_loop(0, ng, step, _wsc(z, mesh))
