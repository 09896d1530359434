"""Pallas TPU kernel: batched shifted tridiagonal solves (inverse iteration).

Solves ``(T - lam_j I) x_j = b_j`` for many shifts at once — the hot inner
op of inverse iteration (ops/tridiag.py).  The XLA path runs the LU /
substitution recurrences as ``lax.scan``s whose per-step overhead dominates
for large n; this kernel runs them as in-VMEM row loops over (8, 128) lane
tiles (1024 systems per grid program), streaming row chunks HBM<->VMEM:

  forward:  l = e_{i-1}/u_{i-1};  u_i = (d_i - lam) - e_{i-1} l  (safeguarded)
            y_i = b_i - l y_{i-1}
  backward: x_i = (y_i - e_i x_{i+1}) / u_i

d/e live in VMEM once (n <= ~200k fits easily); b/u/y/x are chunked.
Rows are padded to the chunk multiple with decoupled identity rows
(e = 0 across the seam), so any n works.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from eigenkernel_tpu.ops._pallas_x32 import kernel_trace_ctx
from jax import lax

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SUB, _LANE = 8, 128
_BLK = _SUB * _LANE
_ROWS = 256      # rows per streamed chunk


def _solve_kernel(d_ref, el_ref, er_ref, lam_ref, b_ref,
                  x_ref, u_ref, y_ref,
                  bt, ut, yt, xt, sem,
                  *, n: int, tiny: float):
    """One grid program: 1024 lanes (8x128), full row sweep over n."""
    # b/x/u/y live in ANY (= HBM) space: real-TPU lowering requires such
    # blocks to be the WHOLE array with a trivial index map, so the grid
    # coordinate is applied here, inside the manual DMA slices
    gi = pl.program_id(0)
    lam = lam_ref[0]                       # (8, 128)
    nchunks = n // _ROWS

    def fwd_chunk(ci, carry):
        u_prev, y_prev = carry
        cp = pltpu.make_async_copy(
            b_ref.at[gi, pl.ds(ci * _ROWS, _ROWS)], bt, sem)
        cp.start()
        cp.wait()

        def row(i, c):
            u_prev, y_prev = c
            g = ci * _ROWS + i
            di = d_ref[g, 0]
            el = el_ref[g, 0]              # e_{i-1} (0 at row 0)
            l = el / u_prev
            u = (di - lam) - el * l
            u = jnp.where(jnp.abs(u) < tiny,
                          jnp.where(u < 0, -tiny, tiny), u)
            y = bt[i] - l * y_prev
            ut[i] = u
            yt[i] = y
            return (u, y)

        carry = lax.fori_loop(0, _ROWS, row, (u_prev, y_prev))
        cpu = pltpu.make_async_copy(ut, u_ref.at[gi, pl.ds(ci * _ROWS, _ROWS)],
                                    sem)
        cpu.start()
        cpu.wait()
        cpy = pltpu.make_async_copy(yt, y_ref.at[gi, pl.ds(ci * _ROWS, _ROWS)],
                                    sem)
        cpy.start()
        cpy.wait()
        return carry

    ones = jnp.ones_like(lam)
    zeros = jnp.zeros_like(lam)
    lax.fori_loop(0, nchunks, fwd_chunk, (ones, zeros))

    def bwd_chunk(cj, x_next):
        ci = nchunks - 1 - cj
        cpu = pltpu.make_async_copy(u_ref.at[gi, pl.ds(ci * _ROWS, _ROWS)],
                                    ut, sem)
        cpu.start()
        cpu.wait()
        cpy = pltpu.make_async_copy(y_ref.at[gi, pl.ds(ci * _ROWS, _ROWS)],
                                    yt, sem)
        cpy.start()
        cpy.wait()

        def row(k, x_next):
            i = _ROWS - 1 - k
            g = ci * _ROWS + i
            er = er_ref[g, 0]              # e_i (0 at row n-1)
            x = (yt[i] - er * x_next) / ut[i]
            xt[i] = x
            return x

        x_next = lax.fori_loop(0, _ROWS, row, x_next)
        cpx = pltpu.make_async_copy(xt, x_ref.at[gi, pl.ds(ci * _ROWS, _ROWS)],
                                    sem)
        cpx.start()
        cpx.wait()
        return x_next

    lax.fori_loop(0, nchunks, bwd_chunk, zeros)


@functools.partial(jax.jit, static_argnames=("interpret",))
def tridiag_solve_pallas(d: jax.Array, e: jax.Array, lam: jax.Array,
                         b: jax.Array, interpret: bool = False) -> jax.Array:
    """Pallas path for ops.tridiag.tridiag_solve_shifted (same contract)."""
    n, k = b.shape
    dtype = d.dtype
    npad = ((n + _ROWS - 1) // _ROWS) * _ROWS
    kpad = ((k + _BLK - 1) // _BLK) * _BLK
    g = kpad // _BLK

    dp = jnp.concatenate([d, jnp.ones((npad - n,), dtype)])
    el = jnp.concatenate([jnp.zeros((1,), dtype), e,
                          jnp.zeros((npad - n,), dtype)])[:npad]
    er = jnp.concatenate([e, jnp.zeros((npad - n + 1,), dtype)])[:npad]
    lamp = jnp.concatenate([lam, jnp.zeros((kpad - k,), dtype)])
    bp = jnp.concatenate([b, jnp.zeros((npad - n, k), dtype)], axis=0)
    bp = jnp.concatenate([bp, jnp.zeros((npad, kpad - k), dtype)], axis=1)

    b4 = bp.reshape(npad, g, _SUB, _LANE).transpose(1, 0, 2, 3)
    lam4 = lamp.reshape(g, _SUB, _LANE)

    # dstein-style pivot floor (huge solutions are renormalized by the
    # inverse-iteration caller, so the floor only prevents inf/nan)
    tiny_val = 1e-30 if dtype == jnp.float64 else 1e-25

    shape4 = jax.ShapeDtypeStruct((g, npad, _SUB, _LANE), dtype)
    pcall = pl.pallas_call(
        functools.partial(_solve_kernel, n=npad, tiny=tiny_val),
        grid=(g,),
        in_specs=[
            pl.BlockSpec((npad, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((npad, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((npad, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _SUB, _LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_shape=[shape4, shape4, shape4],
        scratch_shapes=[
            pltpu.VMEM((_ROWS, _SUB, _LANE), dtype),
            pltpu.VMEM((_ROWS, _SUB, _LANE), dtype),
            pltpu.VMEM((_ROWS, _SUB, _LANE), dtype),
            pltpu.VMEM((_ROWS, _SUB, _LANE), dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )
    # x64 off for the kernel trace: weak scalars must stay 32-bit or
    # Mosaic's 64-bit convert lowering recurses (see pallas_chase.py).
    # Strong f64 operands keep their dtype — only Python literals are
    # canonicalized.
    with kernel_trace_ctx(dtype):
        x4, _, _ = pcall(dp.reshape(npad, 1), el.reshape(npad, 1),
                         er.reshape(npad, 1), lam4, b4)
    x = x4.transpose(1, 0, 2, 3).reshape(npad, kpad)
    return x[:n, :k]
