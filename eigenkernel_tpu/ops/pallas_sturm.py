"""Pallas TPU kernel: batched Sturm-count bisection for tridiagonal
eigenvalues.

Why a custom kernel: the XLA path (ops/tridiag.py) evaluates Sturm counts
with an associative scan that materializes O(n * K) transfer-matrix planes
in HBM on every bisection step — ~60 iterations x ~14 scan levels of
full-plane traffic.  The recurrence LAPACK actually uses (dstebz/dlaneg),

    q_i = (d_i - x) - e_{i-1}^2 / q_{i-1},      count += (q_i < 0)

is sequential in i but trivially parallel over the K shift candidates.  On
TPU that maps to one VPU tile of K lanes iterated n times *entirely in
VMEM*: d and e^2 are read from HBM exactly once, and all ~60 bisection
iterations run inside the kernel with zero HBM round-trips.  It is also
numerically stronger than the minor-product scan: safeguarded pivots never
lose accuracy after near-zero minors.

Layout: eigenvalue targets are tiled into (8, 128) blocks (grid over
ceil(K/1024) programs x 8 sublane rows); d/e2 live in VMEM as (n, 1)
columns read per step via dynamic scalar indexing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from eigenkernel_tpu.ops._pallas_x32 import kernel_trace_ctx
from jax import lax

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# targets per program: 8 sublanes x 128 lanes
_SUB, _LANE = 8, 128
_BLK = _SUB * _LANE


def _sturm_bisect_kernel(d_ref, e2_ref, tgt_ref, lo_ref, hi_ref, out_ref,
                         *, n: int, iters: int):
    dtype = out_ref.dtype
    lo = lo_ref[:]                   # (8, 128)
    hi = hi_ref[:]
    tgt = tgt_ref[:]                 # (8, 128) int32: index+1

    pivmin = jnp.asarray(jnp.finfo(dtype).tiny * 4.0, dtype)

    def bisect_step(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)

        def count_step(i, qc):
            q, cnt = qc
            di = d_ref[i, 0]
            e2i = e2_ref[i, 0]
            q = (di - mid) - e2i / q
            q = jnp.where(jnp.abs(q) < pivmin,
                          jnp.where(q < 0, -pivmin, pivmin), q)
            cnt = cnt + (q < 0).astype(jnp.int32)
            return (q, cnt)

        q0 = jnp.ones_like(mid)
        cnt0 = jnp.zeros(mid.shape, jnp.int32)
        _, cnt = lax.fori_loop(0, n, count_step, (q0, cnt0))
        above = cnt >= tgt           # lambda_target < mid
        hi = jnp.where(above, mid, hi)
        lo = jnp.where(above, lo, mid)
        return (lo, hi)

    lo, hi = lax.fori_loop(0, iters, bisect_step, (lo, hi))
    out_ref[:] = 0.5 * (lo + hi)


@functools.partial(jax.jit,
                   static_argnames=("iters", "interpret"))
def sturm_bisect(d: jax.Array, e: jax.Array, indices: jax.Array,
                 lo0, hi0, iters: int = 0, interpret: bool = False):
    """Eigenvalues ``lambda_{indices}`` of tridiag(d, e) by in-VMEM
    bisection on [lo0, hi0] (host-supplied spectral bounds).

    indices: int32 array (static shape), 0-based ascending positions.
    """
    n = d.shape[0]
    dtype = d.dtype
    if iters == 0:
        iters = 62 if dtype == jnp.float64 else 32
    k = indices.shape[0]
    kpad = ((k + _BLK - 1) // _BLK) * _BLK
    idx = jnp.concatenate(
        [indices.astype(jnp.int32),
         jnp.zeros((kpad - k,), jnp.int32)]) if kpad != k \
        else indices.astype(jnp.int32)
    tgt = (idx + 1).reshape(-1, _LANE)            # (grid*8, 128)
    grid = tgt.shape[0] // _SUB

    e2 = jnp.concatenate([jnp.zeros((1,), dtype), (e * e)]) if n > 1 \
        else jnp.zeros((1,), dtype)
    d2d = d.reshape(n, 1)
    e22d = e2.reshape(n, 1)
    lo = jnp.full((grid * _SUB, _LANE), lo0, dtype)
    hi = jnp.full((grid * _SUB, _LANE), hi0, dtype)

    pcall = pl.pallas_call(
        functools.partial(_sturm_bisect_kernel, n=n, iters=iters),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((n, 1), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 1), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_SUB, _LANE), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_SUB, _LANE), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_SUB, _LANE), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_SUB, _LANE), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid * _SUB, _LANE), dtype),
        interpret=interpret,
    )
    # x64 off for the kernel trace (see pallas_chase.py): strong f64
    # operands keep their dtype, only weak Python literals canonicalize
    with kernel_trace_ctx(dtype):
        out = pcall(d2d, e22d, tgt, lo, hi)
    return out.reshape(-1)[:k]
