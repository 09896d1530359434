"""Blocked dense linear algebra on (optionally mesh-sharded) matrices.

TPU-native equivalents of the reference's distributed ScaLAPACK kernels:

* ``blocked_cholesky``          <- ``pdpotrf`` (generalized_to_standard.f90:24)
* ``invert_lower_triangular``   <- ELPA ``e%invert_triangular`` (solver_elpa.f90:114)
* ``trsm_lower``                <- ``pdtrtrs`` / ``pdtrsm`` (generalized_to_standard.f90:103)
* ``trmm``-style products are plain (sharded) GEMMs — ``pdtrmm``/``pdgemm``/
  ``pdsymm`` analogs need no special code under XLA GSPMD.

Design (TPU-first, not a ScaLAPACK translation):

* Matrices are *global* jax arrays.  When a mesh is given, arrays are pinned
  to a 2D ``('r','c')`` block sharding with ``with_sharding_constraint``;
  every GEMM inside the blocked loops is then partitioned by XLA GSPMD into
  local matmuls + ICI collectives.  There are no descriptors, communicators,
  or explicit messages — the sharding annotation *is* the distribution.
* **Bucketed (recursive-bisection) schedules**: each kernel splits at the
  half point and recurses on the exact trailing block, so the bulk is
  exact-size sharded GEMMs at the optimal flop constants while only
  O(log n) distinct shapes compile (vs. the n/b distinct trailing shapes
  a ScaLAPACK-style shrinking loop would force on XLA).
* Panel factorizations on ``block x block`` diagonal tiles are computed
  replicated on every device (cheap at O(b^3), avoids a latency-bound
  round-trip), the same trade ScaLAPACK makes by serializing panels on one
  process column.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _wsc(x: jax.Array, mesh: Optional[Mesh], spec: P = P("r", "c")) -> jax.Array:
    """Pin ``x`` to a mesh sharding (no-op without a mesh)."""
    if mesh is None:
        return x
    return lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def _check_blocking(n: int, block: int) -> None:
    if n % block != 0:
        raise ValueError(f"matrix dim {n} not divisible by block {block}")


def blocked_cholesky(a: jax.Array, block: int = 256,
                     mesh: Optional[Mesh] = None) -> jax.Array:
    """Lower Cholesky factor of SPD ``a`` (pdpotrf analog).

    Recursive block bisection (the power-of-2 bucketed schedule):

        chol([[A11, .], [A21, A22]]) = [[L11, 0], [L21, L22]],
        L21 = A21 L11^{-T},  L22 = chol(A22 - L21 L21^T)

    so every GEMM is EXACT trailing size — the optimal n^3/3 flop constant
    (the earlier uniform masked-full-update schedule executed ~6x that) —
    while only O(log n) distinct shapes compile.  Base case: replicated
    ``block x block`` lax Cholesky.
    """
    n = a.shape[0]
    if n <= block:
        return lax.linalg.cholesky(a)
    _check_blocking(n, block)
    half = (n // 2 // block) * block
    a11 = a[:half, :half]
    a21 = _wsc(a[half:, :half], mesh, spec=P("r", "c"))
    a22 = a[half:, half:]
    l11 = blocked_cholesky(a11, block, mesh)
    l21 = trsm_right_lower_t(l11, a21, block=block, mesh=mesh)
    a22 = _wsc(a22 - l21 @ l21.T, mesh)
    l22 = blocked_cholesky(a22, block, mesh)
    top = jnp.concatenate(
        [l11, jnp.zeros((half, n - half), a.dtype)], axis=1)
    bot = jnp.concatenate([l21, l22], axis=1)
    return _wsc(jnp.concatenate([top, bot], axis=0), mesh)


def invert_lower_triangular(l: jax.Array, block: int = 256,
                            mesh: Optional[Mesh] = None) -> jax.Array:
    """Explicit inverse of a lower-triangular matrix (ELPA invert_triangular
    analog, solver_elpa.f90:114).

    Recursive block bisection:
        inv([[L11, 0], [L21, L22]]) = [[X11, 0], [-X22 L21 X11, X22]]
    so all O(n^3) work is in sharded GEMMs and only O(log n) distinct
    shapes are compiled; base case solves ``b x b`` triangles against the
    identity, replicated.
    """
    n = l.shape[0]
    if n <= block:
        eye = jnp.eye(n, dtype=l.dtype)
        return lax.linalg.triangular_solve(l, eye, left_side=True, lower=True)
    _check_blocking(n, block)
    half = (n // 2 // block) * block
    if half == 0:
        half = block
    l11 = l[:half, :half]
    l21 = l[half:, :half]
    l22 = l[half:, half:]
    x11 = invert_lower_triangular(l11, block, mesh)
    x22 = invert_lower_triangular(l22, block, mesh)
    x21 = -_wsc(x22 @ _wsc(l21 @ x11, mesh), mesh)
    top = jnp.concatenate([x11, jnp.zeros((half, n - half), l.dtype)], axis=1)
    bot = jnp.concatenate([x21, x22], axis=1)
    return _wsc(jnp.concatenate([top, bot], axis=0), mesh)


def trsm_lower(l: jax.Array, b: jax.Array, *, transpose: bool = False,
               block: int = 256, mesh: Optional[Mesh] = None) -> jax.Array:
    """Solve ``L X = B`` (or ``L^T X = B`` when ``transpose``) with L lower
    triangular (pdtrsm/pdtrtrs analog).

    Recursive block bisection (power-of-2 bucketed): forward

        X1 = L11^{-1} B1,  X2 = L22^{-1} (B2 - L21 X1)

    (mirror order when ``transpose``), so the bulk is exact-size sharded
    GEMMs at the optimal n^2 k flop constant with O(log n) compiled shapes.
    """
    n = l.shape[0]
    if n <= block:
        return lax.linalg.triangular_solve(
            l, b, left_side=True, lower=True, transpose_a=transpose)
    _check_blocking(n, block)
    half = (n // 2 // block) * block
    l11 = l[:half, :half]
    l21 = l[half:, :half]
    l22 = l[half:, half:]
    b1 = b[:half, :]
    b2 = b[half:, :]
    if not transpose:
        x1 = trsm_lower(l11, b1, transpose=False, block=block, mesh=mesh)
        b2 = _wsc(b2 - l21 @ x1, mesh) if mesh else b2 - l21 @ x1
        x2 = trsm_lower(l22, b2, transpose=False, block=block, mesh=mesh)
    else:
        x2 = trsm_lower(l22, b2, transpose=True, block=block, mesh=mesh)
        b1 = _wsc(b1 - l21.T @ x2, mesh) if mesh else b1 - l21.T @ x2
        x1 = trsm_lower(l11, b1, transpose=True, block=block, mesh=mesh)
    return _wsc(jnp.concatenate([x1, x2], axis=0), mesh)


def trsm_right_lower_t(l: jax.Array, b: jax.Array, *, block: int = 256,
                       mesh: Optional[Mesh] = None) -> jax.Array:
    """Solve ``X L^T = B`` (right side): X = (L^{-1} B^T)^T."""
    return trsm_lower(l, b.T, transpose=False, block=block, mesh=mesh).T


def symmetrize(a: jax.Array) -> jax.Array:
    """(A + A^T)/2 — used to keep two-sided updates numerically symmetric."""
    return (a + a.T) * jnp.asarray(0.5, dtype=a.dtype)


def gershgorin_sentinel(a: jax.Array) -> jax.Array:
    """Sentinel value strictly above the spectrum of symmetric ``a``
    (Gershgorin bound + margin) — THE repo-wide padding convention: padded
    diagonal entries use this value so padded eigenpairs sort strictly
    last.  Single definition; the pad-ordering invariants in
    pipelines/_j_sentinelize and ops.qdwh depend on child sentinels
    exceeding inherited parent sentinels, which this formula guarantees
    (mu > max diag entry, and parent sentinels sit on the diagonal)."""
    radius = jnp.sum(jnp.abs(a), axis=1)
    diag = jnp.diagonal(a)
    hi = jnp.max(diag + radius)
    lo = jnp.min(diag - radius)
    return hi + 0.125 * jnp.maximum(hi - lo, 1.0) + 1.0
