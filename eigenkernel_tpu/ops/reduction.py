"""Generalized -> standard reduction and eigenvector recovery.

For the pencil ``A x = lambda B x`` with ``B = L L^T`` SPD:

    A_std = L^{-1} A L^{-T},      A_std y = lambda y,      x = L^{-T} y.

Two strategies, mirroring the reference's two families:

* ``reduce_scalapack`` <- ``reduce_generalized`` (generalized_to_standard.f90:
  13-45): Cholesky + triangular solves (the pdpotrf + pdsygst pipeline).
  Fewer flops, but trsm panels are latency-bound on the mesh.
* ``reduce_elpa``      <- ELPA reduction (solver_elpa.f90:254-292): Cholesky,
  *explicit triangular inverse*, then two GEMMs — the matmul-dominant
  formulation ELPA uses for accelerators; this is the TPU default (the MXU
  eats the extra flops, SURVEY.md §3.3 note).  The reference works on the
  upper factor; we use lower (JAX's native Cholesky) — same math.

Recovery:
* ``recover_scalapack`` <- ``recovery_generalized`` (generalized_to_standard
  .f90:92-112): triangular solve ``x = L^{-T} y`` (pdtrtrs).
* ``recover_elpa``      <- ``pdtrmm`` back-transform (solver_elpa.f90:315):
  GEMM with the stored inverse factor, ``x = R^T y`` where ``R = L^{-1}``.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from eigenkernel_tpu.ops.blocked import (
    _wsc,
    blocked_cholesky,
    invert_lower_triangular,
    symmetrize,
    trsm_lower,
    trsm_right_lower_t,
)


class Reduction(NamedTuple):
    a_std: jax.Array        # L^{-1} A L^{-T}
    factor: jax.Array       # L (scalapack style) or R = L^{-1} (elpa style)
    style: str              # 'scalapack' | 'elpa'


def reduce_scalapack(a: jax.Array, b: jax.Array, block: int = 256,
                     mesh: Optional[Mesh] = None) -> Reduction:
    """pdpotrf + pdsygst analog: A_std = L^{-1} A L^{-T} via two trsm."""
    l = blocked_cholesky(b, block=block, mesh=mesh)
    w = trsm_lower(l, a, block=block, mesh=mesh)           # L^{-1} A
    a_std = trsm_right_lower_t(l, w, block=block, mesh=mesh)  # ... L^{-T}
    return Reduction(a_std=symmetrize(a_std), factor=l, style="scalapack")


def reduce_scalapack_new(a: jax.Array, b: jax.Array, block: int = 256,
                         mesh: Optional[Mesh] = None) -> Reduction:
    """pdpotrf + pdsyngst analog (generalized_to_standard.f90:48-89).

    pdsyngst is ScaLAPACK's half-matrix reduction: with ``A = T + T^T``
    (T = strict lower + half diagonal), only ``S = L^{-1} T L^{-T}`` is
    computed and the result symmetrized, ``A_std = S + S^T`` — half the
    two-sided work in a structure-aware implementation.  Kept as a
    distinct pipeline so `general_scalapacknew_*` solvers are genuinely
    different code paths, as in the reference.
    """
    l = blocked_cholesky(b, block=block, mesh=mesh)
    t = jnp.tril(a, -1) + jnp.diag(jnp.diag(a) / 2)
    s = trsm_lower(l, _wsc(t, mesh), block=block, mesh=mesh)
    s = trsm_right_lower_t(l, s, block=block, mesh=mesh)
    a_std = _wsc(s + s.T, mesh)
    return Reduction(a_std=a_std, factor=l, style="scalapack")


def reduce_elpa(a: jax.Array, b: jax.Array, block: int = 256,
                mesh: Optional[Mesh] = None) -> Reduction:
    """ELPA-style reduction: explicit inverse + two GEMMs (MXU-dominant)."""
    l = blocked_cholesky(b, block=block, mesh=mesh)
    r = invert_lower_triangular(l, block=block, mesh=mesh)  # R = L^{-1}
    w = _wsc(r @ a, mesh)                                   # hermitian_multiply
    a_std = _wsc(w @ r.T, mesh)                             # pdtrmm analog
    return Reduction(a_std=symmetrize(a_std), factor=r, style="elpa")


def recover(red: Reduction, y: jax.Array, block: int = 256,
            mesh: Optional[Mesh] = None) -> jax.Array:
    """Back-transform standard-problem eigenvectors: ``x = L^{-T} y``."""
    if red.style == "scalapack":
        return trsm_lower(red.factor, y, transpose=True, block=block,
                          mesh=mesh)
    return _wsc(red.factor.T @ y, mesh)
