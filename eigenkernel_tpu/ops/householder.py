"""Blocked Householder tridiagonalization + compact-WY back-transform.

TPU-native equivalents of:

* ``tridiagonalize``  <- ``pdsytrd`` (solver_scalapack_all.f90:59) — one-stage
  reduction of a dense symmetric matrix to tridiagonal form, lower variant.
* ``apply_q``         <- ``pdormtr`` (solver_scalapack_all.f90:115) — applies
  the accumulated orthogonal factor to (tridiagonal-basis) eigenvectors.

Algorithm (LAPACK dsytrd/dlatrd structure, re-shaped for XLA):

A single ``lax.fori_loop`` walks the panels; inside, a second ``fori_loop``
performs the sequential Householder steps on *full-length, masked* vectors
(static shapes; loop indices only move masks and dynamic slices),
accumulating the panel's ``V`` and ``W = tau*(A v - corrections)`` columns.
The O(n^3) trailing update ``A <- A - V W^T - W V^T`` is one full-size
rank-2b GEMM per panel — MXU work, sharded over the mesh when one is given.
Because V/W columns are zero outside the panel's trailing rows, the
full-size GEMM touches exactly the trailing block; the spent zero-flops buy
a single compiled computation for any n (see ops/blocked.py design note).
V/W buffers start zeroed and are filled column-by-column, so "use only
columns < j" masking is implicit.

The back-transform applies panels in reverse with the compact-WY identity

    H_s H_{s+1} ... H_{s+b-1} = I - V T V^T,
    T = inv( diag(1/tau) + striu(V^T V) )

so eigenvector recovery is pure GEMMs plus one tiny ``b x b`` triangular
inverse per panel (the identity used by GPU/accelerator ormtr codes; taus of
zero — identity reflectors — are handled by a safe diagonal).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh

from eigenkernel_tpu.ops.blocked import _wsc


# shared with bench.py's roofline model — keep in one place
DEFAULT_SYTRD_SPLIT = 8


class TridiagResult(NamedTuple):
    d: jax.Array      # (n,)   diagonal of T
    e: jax.Array      # (n-1,) subdiagonal of T
    V: jax.Array      # (n, n) Householder vectors, column c = v_c (v[c+1]=1)
    taus: jax.Array   # (n,)   reflector coefficients (0 => identity)


def _householder(x_masked: jax.Array, alpha: jax.Array, pivot: jax.Array,
                 m: int):
    """Householder reflector eliminating ``x`` strictly below ``pivot``.

    ``x_masked`` must already be zero at rows <= pivot.  Returns (v, tau,
    beta) with ``v[pivot] = 1``, zeros above, such that
    ``(I - tau v v^T) x_col = beta e_pivot`` where ``x_col`` is the column
    with value ``alpha`` at the pivot and ``x_masked`` below.
    """
    dtype = x_masked.dtype
    sigma = jnp.sum(x_masked * x_masked)
    zero_tail = sigma == 0
    sgn = jnp.where(alpha >= 0, 1.0, -1.0).astype(dtype)
    mu = jnp.sqrt(alpha * alpha + sigma)
    beta = jnp.where(zero_tail, alpha, -sgn * mu)
    denom = jnp.where(zero_tail, 1.0, alpha - beta).astype(dtype)
    rows = lax.broadcasted_iota(jnp.int32, (m,), 0)
    pivot_onehot = (rows == pivot).astype(dtype)
    live = jnp.logical_not(zero_tail).astype(dtype)
    v = x_masked / denom + live * pivot_onehot
    tau = jnp.where(zero_tail, 0.0,
                    (beta - alpha) / jnp.where(beta == 0, 1.0, beta))
    return v.astype(dtype), tau.astype(dtype), beta.astype(dtype)


def tridiagonalize(a: jax.Array, block: int = 64,
                   mesh: Optional[Mesh] = None) -> TridiagResult:
    """Reduce symmetric ``a`` to tridiagonal ``T = Q^T A Q`` (pdsytrd analog).

    Returns d, e and the (V, taus) representation of
    ``Q = H_0 H_1 ... H_{n-3}`` with ``A = Q T Q^T``.

    Bucketed schedule: panels of the first half run at full size, then the
    reduction RECURSES on the exact trailing half (O(log n) compiled
    shapes) — recovering most of the uniform-schedule flop waste (the
    trailing updates and panel matvecs shrink with the active size).
    """
    import os

    n = a.shape[0]
    dtype = a.dtype
    b = min(block, n)
    if n % b != 0:
        raise ValueError(f"dim {n} not divisible by block {block}")
    # split granularity: process 1/split of the active size per recursion
    # level.  Finer splits cut the panel-matvec HBM traffic (the one-stage
    # bottleneck) toward the optimal 4n^3/3 bytes — split=2: 2.29 n^3,
    # split=4: 1.73 n^3, split=8: 1.52 n^3 — at the cost of a bigger
    # compiled program (TPU v5e M=8192 solve totals: 2.33/1.85/1.68 s).
    split = int(os.environ.get("EK_SYTRD_SPLIT", str(DEFAULT_SYTRD_SPLIT)))
    # ONE full-size (vstore, d, e, taus) threaded through the recursion
    # and written in place at static offsets.  The previous per-level
    # assembly (each level allocating its own (m, m) V plus concats)
    # handed XLA ~log(n) odd-sized GB buffers: at n = 32768 the buffer
    # arena fragmented to 68 % (14.67 GB plan for 4.69 GB of live temps)
    # and the selecting-32k compile OOM'd (evidence/BUDGET_32K_r5.md).
    store = (jnp.zeros((n, n), dtype), jnp.zeros((n,), dtype),
             jnp.zeros((max(n - 1, 1),), dtype), jnp.zeros((n,), dtype))
    vstore, d, e, taus = _tridiag_rec(_wsc(a, mesh), b, mesh, split,
                                      store, 0)
    return TridiagResult(d=d, e=e if n > 1 else jnp.zeros((0,), dtype),
                         V=_wsc(vstore, mesh), taus=taus)


def _tridiag_rec(a: jax.Array, b: int, mesh: Optional[Mesh],
                 split: int, store, off: int):
    m = a.shape[0]
    mid = (m // max(split, 2) // b) * b
    if mid == 0 or m - mid < 2 * b:
        _, store = _tridiag_panels(a, b, mesh, m // b, store, off)
        return store
    a, store = _tridiag_panels(a, b, mesh, mid // b, store, off)
    return _tridiag_rec(a[mid:, mid:], b, mesh, split, store, off + mid)


def _rank2b_update(a: jax.Array, vw: jax.Array, wv: jax.Array) -> jax.Array:
    """``a - vw @ wv.T`` with the (m, m) GEMM temp bounded: above
    EK_SYTRD_UPDATE_TEMP_MB (default 1024 — n=16384 f32 stays one GEMM)
    the update runs in row blocks of the largest panel-multiple divisor
    that keeps the block temp under the cap.  At n=32768 f32 the single
    (m, m) product temp is 4 GB; together with the loop-carried ``a``
    and the reflector store it pushed the selecting-32k plan past HBM
    (r5 chains B/F).  Row blocks partition exactly (divisor of m), so
    each row is updated once — an overlapped last block would subtract
    the update twice."""
    import os

    m = a.shape[0]
    limit_mb = int(os.environ.get("EK_SYTRD_UPDATE_TEMP_MB", "1024"))
    if m * m * a.dtype.itemsize <= limit_mb << 20 or m < 128:
        return a - vw @ wv.T
    rc = max(64, min(m, (limit_mb << 20) // (m * a.dtype.itemsize))
             // 64 * 64)
    while m % rc:
        rc -= 64
    nb = m // rc
    wvt = wv.T

    def body(i, a):
        r0 = i * rc
        blk = lax.dynamic_slice(a, (r0, 0), (rc, m))
        vb = lax.dynamic_slice(vw, (r0, 0), (rc, vw.shape[1]))
        return lax.dynamic_update_slice(a, blk - vb @ wvt, (r0, 0))

    return lax.fori_loop(0, nb, body, a)


def _panel_body(p, carry, b: int, mesh: Optional[Mesh], off: int):
    """One blocked dlatrd panel (index ``p``, traced or static) on the
    carry ``(a, d, e, taus, vstore)``.  Shared by the one-program
    bucketed schedule (`_tridiag_panels`) and the host-stepped uniform
    schedule (`tridiagonalize_staged`)."""
    a, d, e, taus, vstore = carry
    m = a.shape[0]
    dtype = a.dtype
    rows = lax.broadcasted_iota(jnp.int32, (m,), 0)
    rows_e = lax.broadcasted_iota(jnp.int32, (e.shape[0],), 0)
    s = p * b

    def panel_step(j, inner):
        V, W, d, e, taus = inner
        c = s + j
        # -- current column with pending panel updates applied:
        #    a_col = A[:, c] - V W[c,:]^T - W V[c,:]^T
        a_col = lax.dynamic_slice(a, (0, c), (m, 1))[:, 0]
        w_row = lax.dynamic_slice(W, (c, 0), (1, b))[0]
        v_row = lax.dynamic_slice(V, (c, 0), (1, b))[0]
        a_col = a_col - V @ w_row - W @ v_row
        d = d.at[off + c].set(a_col[c])
        # -- Householder on rows > c+1, pivot c+1
        pivot = c + 1
        tail = jnp.where(rows > pivot, a_col, 0.0)
        alpha = lax.dynamic_slice(
            a_col, (jnp.minimum(pivot, m - 1),), (1,))[0]
        v, tau, beta = _householder(tail, alpha, pivot, m)
        live = c < m - 1
        tau = jnp.where(live, tau, 0.0)
        v = jnp.where(live, v, 0.0)
        e = jnp.where((rows_e == off + c) & live, beta, e)
        taus = taus.at[off + c].set(tau)
        # -- w = tau * (A v - V (W^T v) - W (V^T v)), rows >= c+1
        av = a @ v
        av = av - V @ (W.T @ v) - W @ (V.T @ v)
        w = tau * jnp.where(rows >= pivot, av, 0.0)
        w = w - (0.5 * tau * (w @ v)) * v
        V = lax.dynamic_update_slice(V, v[:, None], (0, j))
        W = lax.dynamic_update_slice(W, w[:, None], (0, j))
        return (V, W, d, e, taus)

    V0 = jnp.zeros((m, b), dtype)
    W0 = jnp.zeros((m, b), dtype)
    V, W, d, e, taus = lax.fori_loop(
        0, b, panel_step, (V0, W0, d, e, taus))
    # V/W columns vanish outside the panel's trailing rows, so this
    # full-size rank-2b update touches exactly the trailing block —
    # concatenated into ONE GEMM (one pass over a, not two).
    vw = jnp.concatenate([V, W], axis=1)
    wv = jnp.concatenate([W, V], axis=1)
    a = _wsc(_rank2b_update(a, vw, wv), mesh)
    vstore = lax.dynamic_update_slice(vstore, V, (off, off + s))
    return (a, d, e, taus, vstore)


def _tridiag_panels(a: jax.Array, b: int, mesh: Optional[Mesh],
                    n_panels: int, store, off: int):
    """Run ``n_panels`` leading panels on the (level-sized) matrix ``a``;
    returns the updated matrix and the full-size ``store`` with this
    level's (d, e, taus, V) written at static offset ``off``."""
    vstore0, d0, e0, t0 = store
    a, d, e, taus, vstore = lax.fori_loop(
        0, n_panels, lambda p, c: _panel_body(p, c, b, mesh, off),
        (a, d0, e0, t0, vstore0))
    return a, (vstore, d, e, taus)


def _staged_chunk_fn(b: int, mesh: Optional[Mesh], chunk: int):
    """Compiled ``chunk`` consecutive panels at a traced base index, every
    carry donated (buffers reused in place across host-loop calls)."""
    key = (b, mesh, chunk)
    fn = _STAGED_CACHE.get(key)
    if fn is None:
        def run(p0, a, d, e, taus, vstore):
            carry = (a, d, e, taus, vstore)
            if chunk == 1:
                return _panel_body(p0, carry, b, mesh, 0)
            return lax.fori_loop(
                0, chunk, lambda i, c: _panel_body(p0 + i, c, b, mesh, 0),
                carry)
        fn = jax.jit(run, donate_argnums=(1, 2, 3, 4, 5))
        _STAGED_CACHE[key] = fn
    return fn


_STAGED_CACHE: dict = {}


def tridiagonalize_staged(a: jax.Array, block: int = 64,
                          mesh: Optional[Mesh] = None,
                          donate_ok: bool = False) -> TridiagResult:
    """Host-stepped uniform-schedule ``pdsytrd`` for worker-crash sizes.

    The one-program bucketed ``tridiagonalize`` hard-crashes the tunneled
    v5e TPU worker for n_pad in (28672, 32640..] — four clean repros at
    32640/32768/32832 vs passes at 24576/28672 — while the IDENTICAL
    per-panel computation runs fine as its own executable (0.4 s/panel at
    n=32640, evidence/SWEEP_r5.md chain T / exp38).  This variant walks
    all n/b panels from the host through ONE compiled panel program with
    every carry donated, so the five buffers are reused in place across
    calls and peak HBM is the same as the donated one-program path.

    Schedule is uniform (no trailing-half recursion): every panel's
    matvecs read the full (n, n) matrix, ~1.4x the bucketed HBM traffic
    at 32k — the price of being the only schedule that runs there.
    Masked reflectors leave the reduced leading block inert, so the
    resulting (vstore, d, e, taus) layout is IDENTICAL to
    ``tridiagonalize`` and ``apply_q`` consumes it unchanged.

    ``EK_SYTRD_STAGE_CHUNK`` panels run per host call (default 1 — the
    hardware-validated granularity); a dependent-scalar barrier every
    ``EK_SYTRD_STAGE_SYNC`` calls (default 16) bounds the dispatch queue
    and localizes async failures to a panel index.
    """
    import os

    n = a.shape[0]
    dtype = a.dtype
    b = min(block, n)
    if n % b != 0:
        raise ValueError(f"dim {n} not divisible by block {block}")
    if not donate_ok:
        a = jnp.copy(a)  # the staged loop destroys its input buffer
    chunk = max(1, int(os.environ.get("EK_SYTRD_STAGE_CHUNK", "1")))
    sync = max(1, int(os.environ.get("EK_SYTRD_STAGE_SYNC", "16")))
    n_panels = n // b
    carry = (a, jnp.zeros((n,), dtype), jnp.zeros((max(n - 1, 1),), dtype),
             jnp.zeros((n,), dtype), _wsc(jnp.zeros((n, n), dtype), mesh))
    step = _staged_chunk_fn(b, mesh, chunk)
    main = (n_panels // chunk) * chunk
    calls = 0

    def maybe_sync(p_done):
        nonlocal calls
        calls += 1
        if calls % sync == 0:
            # dependent scalar: bounds the queue, surfaces async errors
            # at a known panel index
            float(carry[1][min(p_done * b, n - 1)])

    for p0 in range(0, main, chunk):
        carry = step(jnp.asarray(p0), *carry)  # canonical int (x64-aware)
        maybe_sync(p0 + chunk - 1)
    if main < n_panels:
        tail = _staged_chunk_fn(b, mesh, 1)
        for p in range(main, n_panels):
            carry = tail(jnp.asarray(p), *carry)
            maybe_sync(p)
    a, d, e, taus, vstore = carry
    return TridiagResult(d=d, e=e if n > 1 else jnp.zeros((0,), dtype),
                         V=vstore, taus=taus)


def wy_t_factor(v: jax.Array, taus: jax.Array) -> jax.Array:
    """Compact-WY T factor: ``H_1...H_b = I - V T V^T`` with T upper
    triangular, via ``T = inv(diag(1/tau) + striu(V^T V))``.

    taus of exactly 0 denote identity reflectors (their V column is zero);
    the safe diagonal keeps the small inverse well defined.
    """
    b = taus.shape[0]
    g = v.T @ v
    safe_diag = 1.0 / jnp.where(taus == 0, 1.0, taus)
    m = jnp.triu(g, k=1) + jnp.diag(safe_diag)
    eye = jnp.eye(b, dtype=v.dtype)
    return lax.linalg.triangular_solve(m, eye, left_side=True, lower=False)


def _wy_group_size(nb: int, b: int, group: int) -> int:
    """Panels per WY group: ``group`` if given, else the largest divisor
    of ``nb`` with group*b <= 512 (HBM traffic over z falls ~1/group; the
    added T-factor flops grow only ~n^2*group*b, negligible)."""
    import os

    g = group or int(os.environ.get("EK_ORMTR_GROUP", "0")) \
        or max(1, 512 // b)
    g = max(1, min(g, nb))
    while nb % g:
        g -= 1
    return g


def apply_q(tri: TridiagResult, z: jax.Array, block: int = 64,
            mesh: Optional[Mesh] = None, transpose: bool = False,
            group: int = 0) -> jax.Array:
    """``z <- Q z`` (or ``Q^T z``), Q from :func:`tridiagonalize`
    (pdormtr analog).  Pure GEMMs in one fori_loop:
    per WY group of ``group`` consecutive panels, ``z -= V (T (V^T z))``.

    Grouping is exact: the compact-WY identity holds for any number of
    consecutive reflectors (wy_t_factor), and one group pass reads z
    once where per-panel passes read it ``group`` times — the
    back-transform is HBM-bound (measured 23 TFLOP/s ~ 50 % of the z
    roofline at n=16384 ungrouped).
    """
    n = tri.V.shape[0]
    b = min(block, n)
    nb = n // b
    g = _wy_group_size(nb, b, group)
    gb = g * b
    ng = nb // g

    def step(i, z):
        p = i if transpose else ng - 1 - i
        s = p * gb
        v = lax.dynamic_slice(tri.V, (0, s), (n, gb))
        tau_p = lax.dynamic_slice(tri.taus, (s,), (gb,))
        t = wy_t_factor(v, tau_p)
        t = t.T if transpose else t
        return _wsc(z - v @ (t @ (v.T @ z)), mesh)

    return lax.fori_loop(0, ng, step, _wsc(z, mesh))


def tridiag_matrix(d: jax.Array, e: jax.Array) -> jax.Array:
    """Dense tridiagonal matrix from (d, e) — for tests/small fallbacks."""
    n = d.shape[0]
    t = jnp.diag(d)
    if n > 1:
        t = t + jnp.diag(e, 1) + jnp.diag(e, -1)
    return t
