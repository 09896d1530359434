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
* Panel factorizations on ``block x block`` diagonal tiles are computed
  replicated on every device (cheap at O(b^3), avoids a latency-bound
  round-trip), exactly the trade ScaLAPACK makes by serializing panels on
  one process column — except here the trailing GEMMs never wait on a
  broadcast because XLA overlaps them.
* Loops over block indices are Python-static: shapes shrink each iteration,
  XLA compiles each trailing update once.  Matrix dims must be divisible by
  ``block`` (callers pad via ``parallel.mesh.padded_dim``).
"""

from __future__ import annotations

from functools import partial
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

    Right-looking blocked algorithm: per panel, a replicated ``b x b``
    Cholesky, a triangular solve forming the panel, and a symmetric trailing
    GEMM update (the O(n^3) part, sharded over the mesh).
    """
    n = a.shape[0]
    if n <= block:
        return lax.linalg.cholesky(a)
    _check_blocking(n, block)
    b = block
    a = _wsc(a, mesh)
    for k in range(n // b):
        s = k * b
        akk = a[s:s + b, s:s + b]
        lkk = lax.linalg.cholesky(akk)
        a = a.at[s:s + b, s:s + b].set(lkk)
        if s + b < n:
            # panel := A[s+b:, s:s+b] @ L_kk^{-T}
            pan = lax.linalg.triangular_solve(
                lkk, a[s + b:, s:s + b],
                left_side=False, lower=True, transpose_a=True)
            a = a.at[s + b:, s:s + b].set(pan)
            trail = a[s + b:, s + b:] - pan @ pan.T
            a = a.at[s + b:, s + b:].set(trail)
            a = _wsc(a, mesh)
    return jnp.tril(a)


def invert_lower_triangular(l: jax.Array, block: int = 256,
                            mesh: Optional[Mesh] = None) -> jax.Array:
    """Explicit inverse of a lower-triangular matrix (ELPA invert_triangular
    analog, solver_elpa.f90:114).

    Recursive block bisection:
        inv([[L11, 0], [L21, L22]]) = [[X11, 0], [-X22 L21 X11, X22]]
    so all O(n^3) work is in sharded GEMMs; base case solves ``b x b``
    triangles against the identity, replicated.
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
    triangular, blocked so the bulk is sharded GEMMs (pdtrsm/pdtrtrs analog).

    Right-looking block substitution: forward over block rows for ``L``,
    backward for ``L^T``.
    """
    n = l.shape[0]
    if n <= block:
        return lax.linalg.triangular_solve(
            l, b, left_side=True, lower=True, transpose_a=transpose)
    _check_blocking(n, block)
    nb = n // block
    x = _wsc(b, mesh)
    order = range(nb) if not transpose else range(nb - 1, -1, -1)
    for k in order:
        s = k * block
        lkk = l[s:s + block, s:s + block]
        xk = lax.linalg.triangular_solve(
            lkk, x[s:s + block, :], left_side=True, lower=True,
            transpose_a=transpose)
        x = x.at[s:s + block, :].set(xk)
        if not transpose and s + block < n:
            upd = x[s + block:, :] - l[s + block:, s:s + block] @ xk
            x = _wsc(x.at[s + block:, :].set(upd), mesh)
        elif transpose and s > 0:
            # (L^T)[0:s, s:s+b] = L[s:s+b, 0:s]^T
            upd = x[:s, :] - l[s:s + block, :s].T @ xk
            x = _wsc(x.at[:s, :].set(upd), mesh)
    return x


def trsm_right_lower_t(l: jax.Array, b: jax.Array, *, block: int = 256,
                       mesh: Optional[Mesh] = None) -> jax.Array:
    """Solve ``X L^T = B`` (right side): X = (L^{-1} B^T)^T."""
    return trsm_lower(l, b.T, transpose=False, block=block, mesh=mesh).T


def symmetrize(a: jax.Array) -> jax.Array:
    """(A + A^T)/2 — used to keep two-sided updates numerically symmetric."""
    return (a + a.T) * jnp.asarray(0.5, dtype=a.dtype)
