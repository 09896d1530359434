"""Pallas TPU kernel: stage-2 (bulge-chase) eigenvector back-transform.

``z <- Q2 z`` where Q2 is the product of all chase reflectors
(ops/bulge.py).  The XLA path re-reads the full eigenvector block from HBM
once per sweep (n sweeps -> O(n^2 k) bytes, ~0.7 s at n=4096) because each
sweep's reflector application is its own fusion.  Here each grid program
pins an (n_pad x TK) COLUMN TILE of Z in VMEM and streams every sweep's
reflectors over it — Z is read and written exactly once per tile, and the
per-sweep batched rank-1 updates (one sweep's windows are disjoint and tile
the rows) run at VMEM bandwidth.

Real-TPU lowering constraints shape the design (all hit on hardware, none
visible in interpret mode):

* dynamic sublane (row) offsets must be provably multiples of 8, but sweep
  c's window starts at row c+1 — every alignment.  So the kernel slices the
  8-ALIGNED superset window ``[base, base + tp*bw)`` with
  ``base = 8*((c+1)//8)`` (annotated via ``pl.multiple_of``), and the
  reflectors are PRE-SHIFTED outside the kernel: ``W[c]`` is sweep c's flat
  reflector vector placed at offset ``off = (c+1) - base`` in a
  ``(tp, bw)`` tile-blocked layout (one XLA gather over the whole store).
  Tile block t then holds the HEAD (rows >= off) of window t and the TAIL
  (rows < off) of window t-1; coefficients and updates split into two
  masked pieces with ``off`` as a traced scalar:

      S_head[t] = sum_{r>=off} W[t,r] z[t,r,:],  S_tail likewise (r<off)
      coef[t]   = S_head[t] + S_tail[t+1]
      z[t,r,:] -= W[t,r] * (r>=off ? coef[t] : coef[t-1])

  (tau is already folded into W — see below — so no scaling appears here)

* DMA'd blocks must keep tile-aligned trailing dims: the T axis of the
  reflector store is padded to a multiple of 8 (zero rows are exact
  no-ops).  The bw (lane) axis must itself be a multiple of 128 on
  hardware — true for the production panel widths; smaller bw falls back
  to the (hardware-validated) WY-grouped blocked path.

* tau never enters the kernel: it is folded into the reflectors outside
  (``H = I - tau v v^T = I - u u^T`` with ``u = sqrt(tau) v``; Householder
  taus are >= 0), so only the single (n, tp, bw) store is DMA'd per sweep,
  double-buffered across sweeps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from eigenkernel_tpu.ops._pallas_x32 import kernel_trace_ctx
from jax import lax

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TK = 256    # eigenvector columns per grid program


def _backtransform_kernel(w_ref, z_ref, out_ref,
                          w_s, sem_v,
                          *, n: int, tp: int, bw: int):
    out_ref[...] = z_ref[...]
    nsweeps = n - 2
    tbp = tp * bw

    def get_dma(slot, c):
        return pltpu.make_async_copy(w_ref.at[c], w_s.at[slot],
                                     sem_v.at[slot])

    get_dma(0, nsweeps - 1).start()

    rr = lax.broadcasted_iota(jnp.int32, (tp, bw), 1)   # r index per block

    def sweep(i, _):
        c = nsweeps - 1 - i
        slot = i % 2

        @pl.when(i + 1 < nsweeps)
        def _():
            get_dma((i + 1) % 2, c - 1).start()

        get_dma(slot, c).wait()
        # pre-shifted, sqrt(tau)-scaled reflectors: H = I - u u^T with
        # u = sqrt(tau) v, so no tau enters the kernel at all
        w = w_s[slot]                       # (tp, bw)
        base = pl.multiple_of(8 * ((c + 1) // 8), 8)
        off = (c + 1) - 8 * ((c + 1) // 8)  # 0..7, traced
        zwin = out_ref[pl.ds(base, tbp), :]          # (tbp, TK)
        zw = zwin.reshape(tp, bw, zwin.shape[-1])
        head = (rr >= off).astype(zw.dtype)          # (tp, bw)
        wz = w[:, :, None] * zw
        s_head = jnp.sum(wz * head[:, :, None], axis=1)     # (tp, TK)
        s_tail = jnp.sum(wz * (1.0 - head)[:, :, None], axis=1)
        zero = jnp.zeros_like(s_tail[:1])
        coef = s_head + jnp.concatenate([s_tail[1:], zero], axis=0)
        t_tail = jnp.concatenate([zero, coef[:-1]], axis=0)
        pick = jnp.where(head[:, :, None] > 0,
                         coef[:, None, :], t_tail[:, None, :])
        zw = zw - w[:, :, None] * pick
        out_ref[pl.ds(base, tbp), :] = zw.reshape(tbp, zwin.shape[-1])
        return 0

    lax.fori_loop(0, nsweeps, sweep, 0)


@functools.partial(jax.jit, static_argnames=("bw", "interpret"))
def apply_chase_q_pallas(hv: jax.Array, ht: jax.Array, z: jax.Array,
                         bw: int, interpret: bool = False) -> jax.Array:
    """Pallas path for ops.bulge.apply_chase_q (no-transpose direction)."""
    n, k = z.shape
    t_dim = hv.shape[1]
    dtype = z.dtype
    if n <= 2 or bw <= 1:
        return z
    kpad = ((k + _TK - 1) // _TK) * _TK
    tp = -(-(t_dim + 1) // 8) * 8            # T+1 padded to sublane tiling
    tbp = tp * bw
    rows_pad = -(-(n + tbp + 8) // 8) * 8
    zp = jnp.zeros((rows_pad, kpad), dtype)
    zp = lax.dynamic_update_slice(zp, z, (0, 0))

    # fold tau into the reflectors (H = I - tau v v^T = I - u u^T with
    # u = sqrt(tau) v; Householder taus are >= 0), then pre-shift: sweep
    # c's flat (T*bw,) vector lands at offset (c+1) mod 8 inside a
    # (tp*bw,) row-tile (one gather pass).  No tau store/DMA at all.
    hv_flat = (hv * jnp.sqrt(ht)[..., None]).reshape(n, t_dim * bw)
    offs = (jnp.arange(n, dtype=jnp.int32) + 1) % 8
    idx = jnp.arange(tbp, dtype=jnp.int32)[None, :] - offs[:, None]
    valid = (idx >= 0) & (idx < t_dim * bw)
    w_shift = jnp.where(
        valid, jnp.take_along_axis(hv_flat, jnp.clip(idx, 0, t_dim * bw - 1),
                                   axis=1), 0)
    w_shift = w_shift.reshape(n, tp, bw)

    pcall = pl.pallas_call(
        functools.partial(_backtransform_kernel, n=n, tp=tp, bw=bw),
        grid=(kpad // _TK,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # U (n, tp, bw) in HBM
            pl.BlockSpec((rows_pad, _TK), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows_pad, _TK), lambda g: (0, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_pad, kpad), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, tp, bw), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )
    # x64 off for the kernel trace: weak scalars must stay 32-bit or
    # Mosaic's 64-bit convert lowering recurses (see pallas_chase.py)
    with kernel_trace_ctx(dtype):
        out = pcall(w_shift, zp)
    return out[:n, :k]
