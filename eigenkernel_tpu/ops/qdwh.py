"""QDWH matrix-sign iteration + spectral divide-and-conquer eigensolver.

TPU-extra family — no reference counterpart (the reference's backends are
all tridiagonalization-based).  This is the Nakatsukasa-Higham QDWH-eig
scheme (SIAM J. Sci. Comput. 35(3), 2013): compute the polar/sign factor
``U = sign(A - sigma*I)`` by the QR-based dynamically weighted Halley
iteration, form the spectral projector ``P = (I - U)/2`` onto the
below-``sigma`` invariant subspace, rotate ``A`` into block-diagonal form
with an orthonormal basis of ``range(P)`` + its complement, and recurse on
the two halves.

Why it earns a slot next to the one-/two-stage cores:

* every flop is a full-size GEMM, Cholesky, triangular solve, or tall QR —
  the MXU/GSPMD sweet spot; there is NO sequential panel or bulge recurrence
  anywhere, so the critical path is O(log n) GEMM rounds vs O(n) panels,
* it is backward stable with *proven* eigenvector orthogonality (no
  inverse-iteration cluster pathology),
* all O(n^3) pieces reuse the in-tree sharded kernels (blocked_cholesky /
  trsm_lower / cholqr2), so it distributes over a mesh for free.

Design notes (TPU-first):

* **Host-level recursion over bucketed static-shape jits.**  The split of
  an m x m block is ONE jitted function per bucket size: ``sigma``, the
  split rank ``k``, and the live dimension ``n_real`` enter as *traced*
  scalars (mask arithmetic, never shapes), so XLA compiles O(#buckets)
  programs, not O(#subproblems).
* **Pad-preserving probe.**  Sub-blocks are padded to bucket sizes with a
  sentinel diagonal above the spectrum (the repo-wide convention,
  pipelines._j_sentinelize).  The subspace probe G is block-diagonal —
  random on the live block, exact identity on the pad — so pad coordinates
  ride through sign/CholQR/GEMM as exact zeros and the padded eigenpairs
  stay in trailing position at every recursion level.
* **Rank-revealing without pivoting.**  ``Y[:, j] = (P G)[:, j]`` for
  ``j < k`` else ``((I-P) G)[:, j]`` — a jnp.where on the column index with
  traced ``k``.  Any k columns of PG span range(P) generically (G random),
  so CholeskyQR2 of Y yields the orthogonal splitting basis with zero
  dynamic shapes.
* Splits are validated on the host from three cheap scalars (k, coupling
  residual, basis orthogonality); bad sigmas (inside a cluster) are retried
  at other diagonal quantiles and a genuinely unsplittable block falls back
  to the dense base-case solver.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh

from eigenkernel_tpu.ops.blocked import (
    _wsc, blocked_cholesky, gershgorin_sentinel, symmetrize, trsm_lower)
from eigenkernel_tpu.ops.tridiag import cholqr2


def qdwh_weights(l0: float, max_iter: int = 40):
    """Dynamically weighted Halley coefficient schedule.

    Returns the list of (a, b, c) per iteration, computed on the host from
    the lower bound ``l0 <= sigma_min(X0)`` (the scalar recurrence depends
    only on l0, so the schedule is static and the iteration unrolls into a
    fixed XLA program).  Terminates when l has converged to 1, plus one
    plain Halley polish step (a,b,c)=(3,1,3).
    """
    l = float(min(max(l0, 1e-18), 1.0))
    out = []
    for _ in range(max_iter):
        d = (4.0 * (1.0 - l * l) / (l ** 4)) ** (1.0 / 3.0)
        a = math.sqrt(1.0 + d) + 0.5 * math.sqrt(
            8.0 - 4.0 * d + 8.0 * (2.0 - l * l) / (l * l * math.sqrt(1.0 + d)))
        b = (a - 1.0) ** 2 / 4.0
        c = a + b - 1.0
        out.append((a, b, c))
        l = l * (a + b * l * l) / (1.0 + c * l * l)
        if 1.0 - l < 1e-14:
            break
    out.append((3.0, 1.0, 3.0))  # Halley polish
    return out


def _chol_block(m: int, block: int) -> int:
    return m if (m <= block or m % block != 0) else block


def sign_qdwh(x: jax.Array, l0: Optional[float] = None, block: int = 256,
              mesh: Optional[Mesh] = None, qr_switch: float = 100.0):
    """Matrix sign function of a symmetric ``x`` by the QDWH iteration.

    Early ill-conditioned iterations (c > qr_switch) use the
    backward-stable QR formulation on the stacked (2m, m) matrix; the rest
    use the cheaper Cholesky formulation built from the in-tree sharded
    blocked kernels.  All iterates stay symmetric (enforced each step).
    """
    m = x.shape[0]
    dt = x.dtype
    if l0 is None:
        l0 = 1e-16 if dt == jnp.float64 else 1e-7
    eye = jnp.eye(m, dtype=dt)
    # accuracy-critical GEMMs carry their own precision context (TPU
    # lowers f32 matmuls to bf16 passes by default, which degrades the
    # sign projector enough to force repeated split rejections) — do not
    # rely on the caller's pipelines._run wrapper
    with jax.default_matmul_precision("highest"):
        return _sign_qdwh_body(x, l0, mesh, qr_switch, m, dt, eye,
                               _chol_block(m, block))


def _sign_qdwh_body(x, l0, mesh, qr_switch, m, dt, eye, bl):
    alpha = jnp.maximum(jnp.linalg.norm(x), jnp.asarray(1e-30, dt))
    x = _wsc(x / alpha, mesh)
    for a, b, c in qdwh_weights(l0):
        # a/b/c are host floats: weak-typed scalars keep x's dtype and the
        # QR-vs-Cholesky variant choice is a trace-time branch
        if c > qr_switch:
            sc = math.sqrt(c)
            q, _ = jnp.linalg.qr(jnp.concatenate([sc * x, eye], axis=0))
            x = (b / c) * x + ((a - b / c) / sc) * (q[:m] @ q[m:].T)
        else:
            z = _wsc(eye + c * (x @ x), mesh)
            l = blocked_cholesky(z, block=bl, mesh=mesh)
            w = trsm_lower(l, x, block=bl, mesh=mesh)           # L^-1 X
            y = trsm_lower(l, w, transpose=True,
                           block=bl, mesh=mesh).T               # X Z^-1
            x = (b / c) * x + (a - b / c) * y
        x = _wsc(symmetrize(x), mesh)
    return x


@partial(jax.jit, static_argnames=("block", "mesh"))
def _j_split(a, sigma, n_real, g, block, mesh):
    """One spectral split of the sentinel-padded block ``a``.

    Returns (v, d, k, off, orth, anorm_live): the orthogonal splitting
    basis, the rotated matrix d = v^T a v (block-diagonal on success), the
    below-sigma count k, the max cross-block coupling |d[>=k, <k]|, the
    basis orthogonality error, and the live block's Frobenius norm — the
    last four are the host's split-quality scalars.
    """
    with jax.default_matmul_precision("highest"):
        m = a.shape[0]
        dt = a.dtype
        idx = jnp.arange(m)
        live = idx < n_real
        # block-diagonal probe: random core, exact identity on the pad
        gmat = jnp.where(live[:, None] & live[None, :], g.astype(dt), 0)
        gmat = gmat + jnp.diag(jnp.where(live, 0, 1).astype(dt))
        u = sign_qdwh(a - sigma * jnp.eye(m, dtype=dt), block=block,
                      mesh=mesh)
        k = jnp.round((m - jnp.trace(u)) / 2).astype(jnp.int32)
        pg = 0.5 * (gmat - u @ gmat)                 # P_minus @ G
        y = jnp.where(idx[None, :] < k, pg, gmat - pg)
        v = cholqr2(_wsc(y, mesh), block=block, mesh=mesh)
        d = symmetrize(v.T @ _wsc(a @ v, mesh))
        cross = (idx[:, None] >= k) & (idx[None, :] < k)
        off = jnp.max(jnp.abs(d) * cross)
        orth = jnp.max(jnp.abs(v.T @ v - jnp.eye(m, dtype=dt)))
        # gate the coupling against the LIVE block's norm: the padded norm
        # grows with inherited sentinels (~1.125x per level) and would
        # progressively loosen the tolerance at depth
        anorm_live = jnp.linalg.norm(
            jnp.where(live[:, None] & live[None, :], a, 0))
        return v, d, k, off, orth, anorm_live


@partial(jax.jit, static_argnames=("m_out",))
def _j_slice_pad(d, off, kk, m_out):
    """Extract d[off:off+kk, off:off+kk] and sentinel-pad it to m_out.

    ``off``/``kk`` are TRACED (one compile per (m_in, m_out) bucket pair,
    not per data-dependent split rank): a static-size dynamic_slice grabs
    the (m_out, m_out) superset, rows/cols >= kk are masked off, and the
    sentinel diagonal is written from the shared Gershgorin bound.
    """
    m_in = d.shape[0]
    big = max(m_in, m_out)
    dp = d if m_in == big else \
        jnp.zeros((big, big), d.dtype).at[:m_in, :m_in].set(d)
    # dynamic_slice clamps the start; re-align any overshoot with a roll
    # (the rolled-in wrap entries land at rows >= kk and are masked off)
    start = jnp.minimum(off, big - m_out)
    blk = lax.dynamic_slice(dp, (start, start), (m_out, m_out))
    over = off - start
    blk = jnp.roll(blk, (-over, -over), axis=(0, 1))
    idx = jnp.arange(m_out)
    livem = idx < kk
    blk = jnp.where(livem[:, None] & livem[None, :], blk, 0)
    mu = gershgorin_sentinel(blk)
    return blk + jnp.diag(jnp.where(livem, 0, mu).astype(d.dtype))


@partial(jax.jit, static_argnames=("mesh",))
def _j_assemble(v, w1, v1, w2, v2, k, mesh):
    """Combine child solutions: w = [w1[:k], w2[:m-k]], V = v @ diag(v1,v2).

    ``k`` is TRACED (one compile per (m, m1, m2) bucket triple, not per
    split rank): the children are embedded by masks and a traced roll —
    roll wrap-around entries land outside each child's masked quadrant.
    """
    m = v.shape[0]
    dt = v.dtype
    idx = jnp.arange(m)
    lo = idx < k

    def embed(x):
        s = min(x.shape[0], m)
        return jnp.zeros((m, m), dt).at[:s, :s].set(x[:s, :s])

    vc = jnp.where(lo[:, None] & lo[None, :], embed(v1), 0)
    v2r = jnp.roll(embed(v2), (k, k), axis=(0, 1))
    vc = vc + jnp.where(lo[:, None] | lo[None, :], 0, v2r)
    w1e = jnp.zeros((m,), w1.dtype).at[:min(w1.shape[0], m)].set(
        w1[:min(w1.shape[0], m)])
    w2e = jnp.zeros((m,), w2.dtype).at[:min(w2.shape[0], m)].set(
        w2[:min(w2.shape[0], m)])
    w = jnp.where(lo, w1e, jnp.roll(w2e, k))
    return w, _wsc(v @ _wsc(vc, mesh), mesh)


@jax.jit
def _j_eigh_base(a):
    return jnp.linalg.eigh(a)


@jax.jit
def _j_diag(a):
    return jnp.diagonal(a)


def _bucket(k: int, base: int) -> int:
    q = 128 if k <= 2048 else 256
    return max(base, ((k + q - 1) // q) * q)


# sigma candidates: quantiles of the live diagonal, tried in order
_SIGMA_QUANTILES = (0.5, 0.35, 0.65, 0.2, 0.8)


def spectral_dc_eigh(a: jax.Array, n_real: Optional[int] = None,
                     base: int = 256, block: int = 256,
                     mesh: Optional[Mesh] = None, seed: int = 7):
    """Full eigendecomposition of sentinel-padded symmetric ``a`` by QDWH
    spectral divide-and-conquer.  Returns (w, v) with the ``n_real`` live
    eigenpairs leading (ascending) and pad eigenpairs trailing, matching
    the repo-wide sentinel convention.
    """
    m = a.shape[0]
    n_real = m if n_real is None else int(n_real)
    dt = a.dtype
    otol = 5e-5 if dt == jnp.float32 else 1e-10
    # one probe matrix per bucket size, fixed seed => deterministic
    probes: dict[int, np.ndarray] = {}

    def probe(mm: int) -> jnp.ndarray:
        if mm not in probes:
            rng = np.random.default_rng(seed + mm)
            probes[mm] = jnp.asarray(
                rng.standard_normal((mm, mm)), dtype=dt)
        return probes[mm]

    def rec(a_dev: jax.Array, live: int):
        mm = a_dev.shape[0]
        if live <= base:
            return _j_eigh_base(a_dev)
        diag = np.asarray(_j_diag(a_dev))[:live]
        split = None
        for q in _SIGMA_QUANTILES:
            sigma = float(np.quantile(diag, q))
            v, d, k, off, orth, anorm = _j_split(
                a_dev, jnp.asarray(sigma, dt), jnp.asarray(live, jnp.int32),
                probe(mm), block, mesh)
            k = int(k)
            if (0 < k < live and float(orth) < otol
                    and float(off) <= otol * max(float(anorm), 1.0)):
                split = (v, d, k)
                break
        if split is None:
            # unsplittable (tight cluster spanning every quantile) — the
            # block is numerically near sigma*I; dense base case is exact
            return _j_eigh_base(a_dev)
        v, d, k = split
        m1, m2 = _bucket(k, base), _bucket(mm - k, base)
        a1 = _j_slice_pad(d, 0, k, m1)
        a2 = _j_slice_pad(d, k, mm - k, m2)
        w1, v1 = rec(a1, k)
        w2, v2 = rec(a2, live - k)
        return _j_assemble(v, w1, v1, w2, v2, k, mesh)

    return rec(a, n_real)
