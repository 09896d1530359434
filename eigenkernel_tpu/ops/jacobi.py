"""Two-sided block-Jacobi symmetric eigensolver (TPU-extra family).

No reference counterpart — this is the classic accelerator-parallel method
added on top of the EigenKernel zoo (the reference's backends are all
tridiagonalization-based).  Rationale: every flop is either a batched
``2b x 2b`` eigh or a full-width GEMM, there is no sequential panel
recurrence at all, and all pairs of one tournament round rotate
SIMULTANEOUSLY — the shape the MXU + GSPMD like best.  More arithmetic
than one-/two-stage (O(n^3) per sweep, ~8-10 sweeps), but embarrassingly
parallel and quadratically convergent.

Algorithm: partition into nb = n/b block rows; a round-robin tournament
(circle method) pairs all blocks disjointly in nb-1 rounds per sweep.  Per
round, the (2b, 2b) pair subproblems are diagonalized batched, and the
resulting block rotations applied as three batched GEMM passes (rows,
columns, eigenvector accumulation).  Off-diagonal mass is annihilated
block-pair-wise; classical convergence theory gives quadratic reduction
per sweep once off(A) is small.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh

from eigenkernel_tpu.ops.blocked import _wsc


def _tournament(nb: int) -> np.ndarray:
    """Round-robin pairings: (nb-1, nb//2, 2) covering all blocks each
    round (circle method, block 0 fixed)."""
    assert nb % 2 == 0
    others = list(range(1, nb))
    rounds = []
    for _ in range(nb - 1):
        ring = [0] + others
        pairs = [(ring[i], ring[nb - 1 - i]) for i in range(nb // 2)]
        rounds.append(pairs)
        others = others[1:] + others[:1]
    return np.asarray(rounds, np.int32)


def _pair_rows(pairs: np.ndarray, b: int) -> np.ndarray:
    """(rounds, m, 2b) global row indices of each pair's block rows."""
    r = np.arange(b, dtype=np.int32)
    return np.concatenate([pairs[..., 0:1] * b + r,
                           pairs[..., 1:2] * b + r], axis=-1)


def block_jacobi_eigh(a: jax.Array, block: int = 64, sweeps: int = 0,
                      mesh: Optional[Mesh] = None):
    """Full eigendecomposition by block Jacobi.  Returns (w, v) ascending.

    ``sweeps=0`` picks a dtype-based default (quadratic convergence makes
    ~8 f64 / ~6 f32 sweeps ample for random spectra; the final sweeps cost
    little extra accuracy loss when already converged).
    """
    n = a.shape[0]
    dtype = a.dtype
    b = min(block, n // 2 if n >= 2 else n)
    if n % b != 0 or (n // b) % 2 != 0:
        # fall back to a pairing-friendly block size
        b = max(8, b)
        while n % b != 0 or (n // b) % 2 != 0:
            b -= 1
            if b == 0:
                w, v = jnp.linalg.eigh(a)
                return w, v
    nb = n // b
    if sweeps <= 0:
        # degenerate spectra need a few extra sweeps to flush residuals
        sweeps = 12 if dtype == jnp.float64 else 8
    rows_tab = jnp.asarray(_pair_rows(_tournament(nb), b))  # (R, m, 2b)
    n_rounds = rows_tab.shape[0]

    def rot_rows(x, rows, rot):
        """rows(pair) <- R^T @ x[rows(pair), :], batched over pairs."""
        blk = x[rows, :]                          # (m, 2b, k)
        blk = jnp.einsum("mij,mik->mjk", rot, blk)
        return x.at[rows, :].set(blk)

    def round_step(i, carry):
        a, v = carry
        rows = rows_tab[i % n_rounds]             # (m, 2b)
        sub = a[rows[:, :, None], rows[:, None, :]]   # (m, 2b, 2b)
        sub = (sub + jnp.swapaxes(sub, 1, 2)) * 0.5
        _, rot = jnp.linalg.eigh(sub)             # (m, 2b, 2b)
        # reorder eigenvector columns closest-to-identity: sorted eigh
        # returns a large permutation even for already-diagonal pair
        # blocks, which makes plain block Jacobi cycle instead of
        # converge (mass sloshes between off-blocks); sorting columns by
        # their argmax row restores the identity fixed point.
        key = jnp.argmax(jnp.abs(rot), axis=1)    # (m, 2b)
        cperm = jnp.argsort(key, axis=1, stable=True)
        rot = jnp.take_along_axis(rot, cperm[:, None, :], axis=2)
        a = rot_rows(a, rows, rot)
        a = rot_rows(a.T, rows, rot).T            # two-sided
        v = rot_rows(v.T, rows, rot).T            # V <- V G
        return _wsc(a, mesh), _wsc(v, mesh)

    v0 = _wsc(jnp.eye(n, dtype=dtype), mesh)
    a, v = lax.fori_loop(0, sweeps * n_rounds, round_step, (_wsc(a, mesh),
                                                            v0))
    d = jnp.diagonal(a)
    perm = jnp.argsort(d)
    return d[perm], v[:, perm]
