"""Pallas TPU kernel: stage-2 (bulge-chase) eigenvector back-transform.

``z <- Q2 z`` where Q2 is the product of all chase reflectors
(ops/bulge.py).  The XLA path re-reads the full eigenvector block from HBM
once per sweep (n sweeps -> O(n^2 k) bytes, ~0.7 s at n=4096) because each
sweep's reflector application is its own fusion.  Here each grid program
pins an (n_pad x TK) COLUMN TILE of Z in VMEM and streams every sweep's
reflectors over it — Z is read and written exactly once per tile, and the
per-sweep batched rank-1 updates (one sweep's windows are disjoint and tile
the rows) run at VMEM bandwidth.

Reflector data (HV: (n, T, bw), HT: (n, T)) is DMA'd from HBM per sweep
(~T*bw*4 bytes, double-buffered across sweeps).

Hardware status (2026-08-16, TPU v5e): interpret-validated only.  Real-TPU
Mosaic rejects the per-sweep window slice ``out_ref[c+1 : c+1+tb]`` —
dynamic sublane offsets must be provably multiples of 8, and the chase
window walks every row.  The fix is a shifted-reflector formulation
(align the slice down to 8, pre-shift HV by (c+1) mod 8 outside the
kernel, mask the two-piece coefficient sums); until then the WY-grouped
blocked path (bulge.apply_chase_q_blocked, hardware-validated) is the
production default — at group g=bw it already reads Z ~once, so this
kernel's remaining advantage is small.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TK = 256    # eigenvector columns per grid program


def _backtransform_kernel(hv_ref, ht_ref, z_ref, out_ref,
                          hv_s, ht_s, sem_v, sem_t,
                          *, n: int, t_dim: int, bw: int):
    out_ref[...] = z_ref[...]
    nsweeps = n - 2
    tb = t_dim * bw

    def get_dma(slot, c):
        return (pltpu.make_async_copy(hv_ref.at[c], hv_s.at[slot],
                                      sem_v.at[slot]),
                pltpu.make_async_copy(ht_ref.at[c], ht_s.at[slot],
                                      sem_t.at[slot]))

    dv, dt = get_dma(0, nsweeps - 1)
    dv.start()
    dt.start()

    def sweep(i, _):
        c = nsweeps - 1 - i
        slot = i % 2

        @pl.when(i + 1 < nsweeps)
        def _():
            dv2, dt2 = get_dma((i + 1) % 2, c - 1)
            dv2.start()
            dt2.start()

        dv, dt = get_dma(slot, c)
        dv.wait()
        dt.wait()
        v = hv_s[slot]                      # (T, bw)
        tau = ht_s[slot]                    # (T,)... stored (T, 1)
        zwin = out_ref[pl.ds(c + 1, tb), :]          # (T*bw, TK)
        zw = zwin.reshape(t_dim, bw, zwin.shape[-1])
        # multiply+sum instead of a batched dot: Mosaic mis-emits the
        # TPU_DotDimensionNumbers attr for "tb,tbk->tk" (parse error on
        # lhs_non_contracting_dims); the op is bandwidth-bound VPU work
        # either way
        coef = jnp.sum(v[:, :, None] * zw, axis=1) * tau
        zw = zw - v[:, :, None] * coef[:, None, :]
        out_ref[pl.ds(c + 1, tb), :] = zw.reshape(tb, zwin.shape[-1])
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
    rows_pad = n + (t_dim + 2) * bw
    zp = jnp.zeros((rows_pad, kpad), dtype)
    zp = lax.dynamic_update_slice(zp, z, (0, 0))
    ht3 = ht[..., None]                     # (n, T, 1) — keep 2D tiles

    out = pl.pallas_call(
        functools.partial(_backtransform_kernel, n=n, t_dim=t_dim, bw=bw),
        grid=(kpad // _TK,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # HV (n, T, bw) in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),   # HT (n, T, 1) in HBM
            pl.BlockSpec((rows_pad, _TK), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows_pad, _TK), lambda g: (0, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_pad, kpad), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, t_dim, bw), dtype),
            pltpu.VMEM((2, t_dim, 1), dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(hv, ht3, zp)
    return out[:n, :k]
