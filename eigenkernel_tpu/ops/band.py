"""Two-stage reduction, stage 1: full -> symmetric band matrix.

TPU-native analog of the first stage of ELPA2's two-stage solver and
EigenExa's ``eigen_sx`` pentadiagonalization (solver_elpa.f90:448,
solver_eigenexa.f90:121-135): the dense matrix is reduced to a band matrix
of semibandwidth ``bw`` using blocked Householder QR panels, so *all* O(n^3)
work is two-sided compact-WY GEMM updates — no memory-bound matvecs (the
reason two-stage beats one-stage on accelerators, SURVEY.md §5
"long-context" analog note).

Per panel (block column of width bw):

  1. Householder QR of the subdiagonal block ``A[s+bw:, s:s+bw]`` (masked
     ``fori_loop``, static shapes),
  2. the block itself becomes ``[R; 0]`` (inside the band),
  3. trailing two-sided update ``A22 <- Q^T A22 Q`` with
     ``Q = I - V T V^T``:  ``W = A V T``, ``U = W - V (T^T V^T W)/2``,
     ``A <- A - U V^T - V U^T``  — three large GEMMs.

Stage 2 (band -> tridiagonal) currently reuses the one-stage Householder
reduction on the banded matrix (mathematically exact; a windowed bulge-chase
replacement is the planned optimization), see solvers/twostage.py.
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
    bw: int


def _qr_panel(p: jax.Array):
    """Householder QR of ``p`` (m x b) with masked sequential columns.

    Returns (V, taus, R) where column j of V is the full-length reflector
    (unit pivot at row j, zeros above) and R is upper triangular (m x b,
    zero below row b).
    """
    m, b = p.shape
    dtype = p.dtype
    rows = lax.broadcasted_iota(jnp.int32, (m,), 0)

    def step(j, carry):
        p, V, taus = carry
        x = lax.dynamic_slice(p, (0, j), (m, 1))[:, 0]
        tail = jnp.where(rows > j, x, 0.0)
        alpha = x[j]
        sigma = jnp.sum(tail * tail)
        zero_tail = sigma == 0
        sgn = jnp.where(alpha >= 0, 1.0, -1.0).astype(dtype)
        beta = jnp.where(zero_tail, alpha,
                         -sgn * jnp.sqrt(alpha * alpha + sigma))
        denom = jnp.where(zero_tail, 1.0, alpha - beta).astype(dtype)
        live = jnp.logical_not(zero_tail).astype(dtype)
        v = tail / denom + live * (rows == j).astype(dtype)
        tau = jnp.where(zero_tail, 0.0,
                        (beta - alpha) / jnp.where(beta == 0, 1.0, beta))
        p = p - tau * jnp.outer(v, v @ p)
        V = lax.dynamic_update_slice(V, v[:, None], (0, j))
        taus = taus.at[j].set(tau)
        return (p, V, taus)

    V0 = jnp.zeros((m, b), dtype)
    t0 = jnp.zeros((b,), dtype)
    p, V, taus = lax.fori_loop(0, min(b, m), step, (p, V0, t0))
    return V, taus, p


def to_band(a: jax.Array, bw: int,
            mesh: Optional[Mesh] = None) -> BandResult:
    """Reduce symmetric ``a`` to a band matrix: ``A_band = Q^T A Q``."""
    n = a.shape[0]
    dtype = a.dtype
    if n % bw != 0:
        raise ValueError(f"dim {n} not divisible by bandwidth {bw}")
    a = _wsc(a, mesh)
    vstore = jnp.zeros((n, n), dtype)
    taus = jnp.zeros((n,), dtype)

    for s in range(0, n - bw, bw):
        m = n - s - bw
        panel = a[s + bw:, s:s + bw]
        V, tau_p, r = _qr_panel(panel)
        r_block = jnp.concatenate(
            [jnp.triu(r[:bw]), jnp.zeros((m - bw, bw), dtype)], axis=0)
        a = a.at[s + bw:, s:s + bw].set(r_block)
        a = a.at[s:s + bw, s + bw:].set(r_block.T)
        # trailing two-sided update
        t = wy_t_factor(V, tau_p)
        a22 = a[s + bw:, s + bw:]
        av = a22 @ V
        w = av @ t
        mmat = t.T @ (V.T @ av) @ t
        u = w - 0.5 * (V @ mmat)
        a22 = a22 - u @ V.T - V @ u.T
        a = _wsc(a.at[s + bw:, s + bw:].set(a22), mesh)
        vstore = vstore.at[s + bw:, s:s + bw].set(V)
        taus = lax.dynamic_update_slice(taus, tau_p, (s,))

    # numerical cleanup: zero everything outside the band
    idx = jnp.arange(n)
    mask = jnp.abs(idx[:, None] - idx[None, :]) <= bw
    band = jnp.where(mask, a, 0.0)
    return BandResult(band=band, V=vstore, taus=taus, bw=bw)


def apply_band_q(res: BandResult, z: jax.Array, bw: Optional[int] = None,
                 mesh: Optional[Mesh] = None,
                 transpose: bool = False) -> jax.Array:
    """``z <- Q z`` with Q the stage-1 band-reduction transform."""
    bw = bw or res.bw
    n = res.V.shape[0]
    panels = [s for s in range(0, max(n - bw, 0), bw)]
    if not transpose:
        panels = panels[::-1]
    z = _wsc(z, mesh)
    for s in panels:
        v = res.V[:, s:s + bw]
        t = wy_t_factor(v, res.taus[s:s + bw])
        t = t.T if transpose else t
        z = z - v @ (t @ (v.T @ z))
        z = _wsc(z, mesh)
    return z
