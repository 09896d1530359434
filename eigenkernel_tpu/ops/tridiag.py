"""Symmetric tridiagonal eigensolver: bisection + inverse iteration.

TPU-native replacement for the reference's tridiagonal cores:

* ``pdstedc``  (divide & conquer, solver_scalapack_all.f90:96)
* ``pdsyevx``  (bisection + inverse iteration, solver_scalapack_select.f90:56)
* the D&C stages inside ELPA / EigenExa.

Design: the classic tridiagonal algorithms are sequential recurrences; on
TPU every recurrence here is re-expressed as a *parallel associative scan*
so the VPU processes all rows at once, batched over eigenvalues:

* **Sturm counts** — the leading principal minors ``P_k`` of ``T - x I``
  satisfy a 2-term linear recurrence == a product of 2x2 transfer matrices.
  ``lax.associative_scan`` over normalized matrix products yields all
  prefixes in O(log n) depth; the eigenvalue count below ``x`` is the number
  of sign changes of the ``P_k`` sequence.  Batched over candidate points,
  bisection resolves any index subset to machine precision — this also IS
  the partial-spectrum path (``-n``; pdsyevx analog) at no extra cost.
* **Inverse iteration** — the shifted LU pivots ``u_k`` are ratios of the
  same minors (one more scan); forward/backward substitutions are affine
  first-order recurrences, each an associative scan over (a, c) pairs
  composing ``y -> a*y + c``.  Near-singular pivots are safeguarded dstein
  style.  Batched over all requested eigenvalues at once.
* **Clusters** — shifts closer than ``minsep`` are separated by a prefix-max
  (so each inverse iteration targets a distinct point of a degenerate
  cluster), then the vector block is re-orthonormalized globally with
  CholeskyQR2 — GEMM-rich, mesh-shardable, and only mixes vectors within
  clusters (G is near-identity elsewhere).

Everything is jit-compatible: no host round-trips, static shapes.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh

from eigenkernel_tpu.ops.blocked import _wsc, blocked_cholesky

_TINY = 1e-300
_CHUNK = 1024  # eigenvalue batch per scan, bounds scan memory at n*CHUNK*4


def _lane_wsc(x: jax.Array, mesh: Optional[Mesh]) -> jax.Array:
    """Shard the eigenvalue-lane (last) axis over every mesh device — the
    Sturm counts and shifted solves are embarrassingly parallel in lanes."""
    if mesh is None:
        return x
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*([None] * (x.ndim - 1)),
                                 tuple(mesh.axis_names))))


def _minor_scan(d: jax.Array, e: jax.Array, xs: jax.Array,
                mesh: Optional[Mesh] = None):
    """Leading principal minors of ``T - x I`` for each shift in ``xs``.

    Returns ``(pk, pkm1)`` of shape (n, nx): the k-th row holds
    ``(P_k, P_{k-1})`` up to a *common* positive per-prefix scaling, so both
    ``sign(P_k P_{k-1})`` and the pivot ratios ``u_k = P_k / P_{k-1}`` are
    exact.  (Prefix products are normalized independently, so values from
    different rows are NOT mutually comparable.)
    """
    n = d.shape[0]
    nx = xs.shape[0]
    dtype = d.dtype
    e2 = jnp.concatenate([jnp.zeros((1,), dtype), e * e]) if n > 1 \
        else jnp.zeros((1,), dtype)
    # transfer matrices M_k = [[d_{k-1}-x, -e2_{k-1}], [1, 0]], k = 1..n,
    # carried as four separate (n, nx) planes: a (n,nx,2,2) layout would be
    # padded to (8,128) TPU tiles on the trailing dims — a 256x memory blowup.
    m11 = _lane_wsc(d[:, None] - xs[None, :], mesh)   # (n, nx)
    m12 = _lane_wsc(-e2[:, None] * jnp.ones((1, nx), dtype), mesh)
    m21 = jnp.ones_like(m11)
    m22 = jnp.zeros_like(m11)

    def combine(x, y):
        # z = y @ x, entrywise on the 4 planes, renormalized to avoid
        # overflow (positive per-prefix scaling preserves signs & ratios)
        x11, x12, x21, x22 = x
        y11, y12, y21, y22 = y
        z11 = y11 * x11 + y12 * x21
        z12 = y11 * x12 + y12 * x22
        z21 = y21 * x11 + y22 * x21
        z22 = y21 * x12 + y22 * x22
        scale = jnp.maximum(jnp.maximum(jnp.abs(z11), jnp.abs(z12)),
                            jnp.maximum(jnp.abs(z21), jnp.abs(z22)))
        inv = 1.0 / jnp.maximum(scale, jnp.finfo(dtype).tiny)
        return (z11 * inv, z12 * inv, z21 * inv, z22 * inv)

    g11, _, g21, _ = lax.associative_scan(
        combine, (m11, m12, m21, m22), axis=0)
    # [P_k, P_{k-1}]^T = G_k @ [1, 0]^T -> first column of each prefix.
    return g11, g21


def _count_below(d: jax.Array, e: jax.Array, xs: jax.Array,
                 mesh: Optional[Mesh] = None) -> jax.Array:
    """Number of eigenvalues of T strictly below each x (Sturm count)."""
    pk, pkm1 = _minor_scan(d, e, xs, mesh=mesh)
    pk = jnp.where(pk == 0, -jnp.finfo(d.dtype).tiny, pk)
    flips = jnp.sum((pk * pkm1 < 0).astype(jnp.int32), axis=0)
    return flips


def gershgorin_bounds(d: jax.Array, e: jax.Array):
    n = d.shape[0]
    dtype = d.dtype
    if n == 1:
        r = jnp.zeros((1,), dtype)
    else:
        eab = jnp.abs(e)
        z = jnp.zeros((1,), dtype)
        r = jnp.concatenate([eab, z]) + jnp.concatenate([z, eab])
    lo = jnp.min(d - r)
    hi = jnp.max(d + r)
    span = jnp.maximum(hi - lo, jnp.finfo(dtype).tiny)
    return lo - 0.001 * span, hi + 0.001 * span


def bisect_eigenvalues(d: jax.Array, e: jax.Array, indices: jax.Array,
                       iters: Optional[int] = None,
                       chunk: int = _CHUNK,
                       method: Optional[str] = None,
                       mesh: Optional[Mesh] = None) -> jax.Array:
    """Eigenvalues ``lambda_{indices}`` (0-based, ascending) by bisection.

    ``indices`` is a static-shape int array; ~60 f64 / ~30 f32 bisection
    steps resolve each interval to machine precision relative to the
    spectral span.

    method: 'pallas' (in-VMEM TPU kernel, ops/pallas_sturm.py), 'scan'
    (associative-scan XLA path), or None -> EK_STURM env or backend auto
    (pallas on TPU, scan on CPU).
    """
    import os

    dtype = d.dtype
    if iters is None:
        iters = 62 if dtype == jnp.float64 else 30
    lo0, hi0 = gershgorin_bounds(d, e)

    method = method or os.environ.get("EK_STURM", "auto")
    if method == "auto":
        # Pallas kernels are TPU-only; any other accelerator backend would
        # fail to lower them, so gate strictly on tpu.
        method = "pallas" if jax.default_backend() == "tpu" else "scan"
    if method == "pallas":
        from eigenkernel_tpu.ops.pallas_sturm import sturm_bisect

        return sturm_bisect(d, e, indices, lo0, hi0, iters=iters)
    k = indices.shape[0]

    def solve_chunk(idx):
        lo = jnp.full(idx.shape, lo0, dtype)
        hi = jnp.full(idx.shape, hi0, dtype)

        def body(_, lh):
            lo, hi = lh
            mid = 0.5 * (lo + hi)
            cnt = _count_below(d, e, mid, mesh=mesh)
            above = cnt >= idx + 1      # lambda_idx < mid
            hi = jnp.where(above, mid, hi)
            lo = jnp.where(above, lo, mid)
            return lo, hi

        lo, hi = lax.fori_loop(0, iters, body, (lo, hi))
        return 0.5 * (lo + hi)

    if k <= chunk:
        return solve_chunk(indices)
    pad = (-k) % chunk
    idx_p = jnp.concatenate(
        [indices, jnp.full((pad,), indices[-1], indices.dtype)])
    out = lax.map(solve_chunk, idx_p.reshape(-1, chunk))
    return out.reshape(-1)[:k]


def _affine_scan(a: jax.Array, c: jax.Array, reverse: bool = False):
    """Solve y_k = a_k * y_{k-1} + c_k for all k via associative scan.

    a, c: (n, nx); the k=0 element must have a_0 = 0 (y_0 = c_0).
    """
    def combine(p, q):
        (pa, pc), (qa, qc) = p, q
        return (qa * pa, qa * pc + qc)

    ra, rc = lax.associative_scan(combine, (a, c), axis=0, reverse=reverse)
    return rc


def tridiag_solve_shifted(d: jax.Array, e: jax.Array, lam: jax.Array,
                          b: jax.Array) -> jax.Array:
    """Solve ``(T - lam_j I) x_j = b_j`` for every column j, in parallel.

    LU without pivoting with dstein-style safeguarded tiny pivots.  The
    recurrences run as two ``lax.scan``s over the matrix dimension; each
    step is a fused VPU op over all ``k`` eigenvalue lanes at once, so the
    work per sequential step is wide.  (An associative-scan formulation via
    minor ratios exists but loses all accuracy after a near-zero pivot —
    the sequential LU is the numerically sound choice.)
    d:(n,), e:(n-1,), lam:(k,), b:(n,k).
    """
    n, dtype = d.shape[0], d.dtype
    eps = jnp.finfo(dtype).eps
    scale = jnp.maximum(jnp.max(jnp.abs(d)),
                        jnp.max(jnp.abs(e)) if n > 1 else 0.0)
    tiny = jnp.maximum(scale, 1.0) * eps * eps

    def safeguard(u):
        return jnp.where(jnp.abs(u) < tiny,
                         jnp.where(u >= 0, tiny, -tiny), u)

    dk = d[:, None] - lam[None, :]              # (n, k) diag of T - lam I
    if n == 1:
        return b / safeguard(dk)
    e_prev = jnp.concatenate([jnp.zeros((1,), dtype), e])    # e_{k-1}
    e_next = jnp.concatenate([e, jnp.zeros((1,), dtype)])    # e_k

    nx = lam.shape[0]

    def fwd_step(carry, inp):
        u_prev, y_prev = carry
        dk_row, e_km1, b_row = inp
        l = e_km1 / u_prev
        u = safeguard(dk_row - e_km1 * l)
        y = b_row - l * y_prev
        return (u, y), (u, y)

    ones = jnp.ones((nx,), dtype)
    (_, _), (u, y) = lax.scan(
        fwd_step, (ones, jnp.zeros((nx,), dtype)),
        (dk, e_prev[:, None] * jnp.ones((1, nx), dtype), b))

    def bwd_step(x_next, inp):
        u_row, y_row, e_k = inp
        x = (y_row - e_k * x_next) / u_row
        return x, x

    _, x = lax.scan(
        bwd_step, jnp.zeros((nx,), dtype),
        (u, y, e_next[:, None] * jnp.ones((1, nx), dtype)),
        reverse=True)
    return x


def separate_shifts(lam: jax.Array, minsep: jax.Array) -> jax.Array:
    """Spread (sorted) shifts so consecutive ones differ by >= minsep:
    ``s_j = j*minsep + cummax(lam_j - j*minsep)`` — inverse iteration then
    targets distinct points inside degenerate clusters (dstein's ortol
    perturbation, done scan-parallel)."""
    k = lam.shape[0]
    j = jnp.arange(k, dtype=lam.dtype)
    t = lam - j * minsep
    t = lax.associative_scan(jnp.maximum, t)
    return t + j * minsep


def cholqr2(v: jax.Array, block: int = 256,
            mesh: Optional[Mesh] = None) -> jax.Array:
    """Orthonormalize columns of ``v`` by two rounds of Cholesky-QR.

    Distributed-friendly QR: all O(nk^2) work is (sharded) GEMM plus a
    blocked Cholesky; two rounds give near machine-precision orthogonality
    for mildly ill-conditioned inputs (CholeskyQR2, Yamamoto et al.).
    """
    from eigenkernel_tpu.ops.blocked import trsm_lower

    for _ in range(2):
        g = v.T @ v
        if mesh is not None:
            g = _wsc(g, mesh)
        k = g.shape[0]
        bl = k if (k <= block or k % block != 0) else block
        l = blocked_cholesky(g, block=bl, mesh=mesh)
        # v <- v L^{-T} == (L^{-1} v^T)^T, blocked so it shards.
        v = trsm_lower(l, v.T, transpose=False, block=bl, mesh=mesh).T
    return v


def tridiag_eigh(d: jax.Array, e: jax.Array, n_vec: Optional[int] = None,
                 mesh: Optional[Mesh] = None, invit_steps: int = 3,
                 want_vectors: bool = True):
    """Eigen-decomposition of a symmetric tridiagonal matrix.

    Returns (values, vectors) with values ascending and vectors (n, n_vec);
    vectors is None when ``want_vectors`` is False.  ``n_vec`` selects the
    lowest part of the spectrum (pdsyevx-analog selecting path).
    """
    import os

    n, dtype = d.shape[0], d.dtype
    k = n if n_vec is None else int(n_vec)
    if n <= 8:
        from eigenkernel_tpu.ops.householder import tridiag_matrix
        w, z = jnp.linalg.eigh(tridiag_matrix(d, e))
        return w[:k], (z[:, :k] if want_vectors else None)

    # Core selection mirrors the reference: divide & conquer (pdstedc
    # analog, ops/dc.py) for the full spectrum, bisection + inverse
    # iteration (pdsyevx analog) when selecting a small part or when only
    # eigenvalues are wanted.
    core = os.environ.get("EK_TRIDIAG", "auto")
    if core == "auto":
        core = "dc" if (want_vectors and 2 * k >= n) else "bisect"
    if core == "dc" and want_vectors:
        from eigenkernel_tpu.ops.dc import tridiag_dc
        w, z = tridiag_dc(d, e, mesh=mesh)
        return w[:k], z[:, :k]

    lam = bisect_eigenvalues(d, e, jnp.arange(k), mesh=mesh)
    if not want_vectors:
        return lam, None

    eps = jnp.finfo(dtype).eps
    lo, hi = gershgorin_bounds(d, e)
    span = hi - lo
    lam_sep = separate_shifts(lam, 4.0 * eps * span)

    import os

    method = os.environ.get("EK_SOLVE", "auto")
    if method == "auto":
        # The Pallas kernel's per-program output slice is stack-allocated
        # in scoped VMEM by the Mosaic lowering; at n=24576 that demands
        # 28 MB against the 16 MB scoped limit and the COMPILE fails
        # (measured 2026-08-20, chain P).  n<=16384 is the hardware-
        # validated domain; beyond it the chunked scan path works at any
        # size (it streams rows through a fori carry instead).
        on_tpu = jax.default_backend() == "tpu"
        method = "pallas" if (on_tpu and n <= 16384) else "scan"
    solver = tridiag_solve_shifted
    if method == "pallas":
        from eigenkernel_tpu.ops.pallas_solve import tridiag_solve_pallas
        solver = tridiag_solve_pallas

    v = _lane_wsc(jax.random.normal(jax.random.PRNGKey(7), (n, k), dtype),
                  mesh)
    for _ in range(invit_steps):
        v = _lane_wsc(solver(d, e, lam_sep, v), mesh)
        v = v / jnp.linalg.norm(v, axis=0, keepdims=True)
    v = cholqr2(v, mesh=mesh)
    return lam, v
