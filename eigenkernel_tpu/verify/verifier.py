"""Result verification: residual norms, orthogonality, ipratios.

Reference parity: verifier.f90 + get_ipratios (distribute_matrix.f90:18-78).

* ``eval_residual_norm`` <- verifier.f90:75-204 (BLACS variant semantics):
  ``R = A V - B V diag(lambda)``; per-column 2-norms; returns
  ``(A_norm_F, ave, max)`` with ave/max divided by ``||A||_F``.
* ``eval_orthogonality`` <- verifier.f90:233-330: Gram matrix
  ``G = V^T [B] V`` over the index window, scaled ``G_ij /
  sqrt(G_ii G_jj)``, diagonal zeroed, Frobenius norm.
* ``get_ipratios``: ``ipr_j = sum_i v_ij^4 / (sum_i v_ij * (B v)_ij)^2``
  (plain ``v^2`` in the denominator sum for standard problems).

All computations are (sharded) GEMMs/reductions on device; matrices arrive
as dense jax arrays — the sparse-COO redistribution dance of the reference
(verifier.f90:122-131) is unnecessary because the dense operands are already
on the mesh.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from eigenkernel_tpu.core.types import EigenPairs


@jax.jit
def _residual_stats(a, v, w, bv):
    # accuracy-critical: TPU lowers f32 matmuls to bf16 passes by default,
    # which would mask the solver's true residual (CLAUDE.md rule).
    with jax.default_matmul_precision("highest"):
        r = a @ v - bv * w[None, :]
        norms = jnp.linalg.norm(r, axis=0)
        a_norm = jnp.linalg.norm(a)
        return a_norm, jnp.mean(norms) / a_norm, jnp.max(norms) / a_norm


def eval_residual_norm(a, eigenpairs: EigenPairs, n_check: int,
                       b=None):
    """Average and max of ``||A v - lambda [B] v||_2 / ||A||_F`` over the
    first ``n_check`` eigenpairs.  Returns (A_norm, ave, max) as floats."""
    v = eigenpairs.vectors[:, :n_check]
    w = eigenpairs.values[:n_check]
    a = jnp.asarray(a, dtype=v.dtype)
    with jax.default_matmul_precision("highest"):
        bv = (jnp.asarray(b, dtype=v.dtype) @ v) if b is not None else v
    a_norm, ave, mx = _residual_stats(a, v, w, bv)
    return float(a_norm), float(ave), float(mx)


@jax.jit
def _ortho_stat(g):
    d = jnp.sqrt(jnp.abs(jnp.diag(g)))
    gs = g / jnp.outer(d, d)
    gs = gs - jnp.diag(jnp.diag(gs))
    return jnp.linalg.norm(gs)


def eval_orthogonality(eigenpairs: EigenPairs, index_start: int,
                       index_end: int, b=None) -> float:
    """``||offdiag(D^{-1/2} G D^{-1/2})||_F`` with ``G = V^T [B] V`` over
    eigenvector indices [index_start, index_end] (1-based, inclusive)."""
    v = eigenpairs.vectors[:, index_start - 1:index_end]
    with jax.default_matmul_precision("highest"):
        gv = (jnp.asarray(b, dtype=v.dtype) @ v) if b is not None else v
        g = v.T @ gv
    return float(_ortho_stat(g))


@jax.jit
def _ipr(v, gv):
    sum4 = jnp.sum(v ** 4, axis=0)
    sum2 = jnp.sum(v * gv, axis=0)
    return sum4 / (sum2 * sum2)


def get_ipratios(eigenpairs: EigenPairs, b=None):
    """Inverse participation ratios of the eigenvectors (B-metric when
    generalized).  Returns a host float64 array of length n_vec."""
    import numpy as np

    v = eigenpairs.vectors
    with jax.default_matmul_precision("highest"):
        gv = (jnp.asarray(b, dtype=v.dtype) @ v) if b is not None else v
    return np.asarray(jax.device_get(_ipr(v, gv)))
