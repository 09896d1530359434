"""Two-stage SEP core: full -> band -> tridiagonal (eigen_sx / ELPA2 analog).

Stage 1 (ops/band.py) does all-GEMM full->band reduction.  Stage 2
currently tridiagonalizes the banded matrix with the one-stage Householder
kernel — mathematically exact, and its matvecs touch a mostly-banded
matrix; replacing it with a windowed bulge-chase (and WY-grouped stage-2
back-transform, the ELPA2 trick) is the planned kernel optimization.

Eigenvector recovery composes both stages:
``z_A = Q_band (Q_tri z_T)`` — two blocks of pure GEMMs.
"""

from __future__ import annotations

from functools import partial

import jax

from eigenkernel_tpu.ops import band as bandlib
from eigenkernel_tpu.ops import householder


@partial(jax.jit, static_argnames=("bw", "mesh"))
def _j_to_band(a, bw, mesh):
    return bandlib.to_band(a, bw=bw, mesh=mesh)


@partial(jax.jit, static_argnames=("block", "mesh"))
def _j_tridiagonalize(a, block, mesh):
    return householder.tridiagonalize(a, block=block, mesh=mesh)


@partial(jax.jit, static_argnames=("bw", "block", "mesh"))
def _j_back_transform_two_stage(band_res, tri, z, bw, block, mesh):
    z = householder.apply_q(tri, z, block=block, mesh=mesh)
    return bandlib.apply_band_q(band_res, z, bw=bw, mesh=mesh)


def sep_two_stage(ctx, a: jax.Array, n_vec: int):
    from eigenkernel_tpu.solvers.pipelines import _j_tridiag_eigh, _run

    bw = ctx.block_size
    band_res = _run(ctx, "sep:full_to_band", _j_to_band, a, bw, ctx.mesh)
    tri = _run(ctx, "sep:band_to_tridiag", _j_tridiagonalize,
               band_res.band, ctx.block_size, ctx.mesh)
    w, z = _run(ctx, "sep:tridiag_eigh", _j_tridiag_eigh,
                tri.d, tri.e, n_vec, ctx.mesh)
    z = _run(ctx, "sep:back_transform", _j_back_transform_two_stage,
             band_res, tri, z, bw, ctx.block_size, ctx.mesh)
    return w, z
