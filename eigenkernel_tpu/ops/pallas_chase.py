"""Pallas TPU kernel: the full bulge-chase scan resident in VMEM.

The XLA wavefront2 chase (ops/bulge.py::band_to_tridiag_wavefront2) is
correct but latency-bound: each of the ~4n scan steps pays ~60-85 us of
XLA op dispatch + HBM round-trips for ~5 us of compute (measured on
v5e: n=4096 1.02 s, n=8192 2.84 s at bw=32).  The banded state is only
``O(n * bw)`` — 4.4 MB at n=8192/bw=32 — so the whole chase fits in
VMEM.  This kernel runs the ENTIRE chase as one pallas_call:

  * grid = (tau_max,): TPU grid steps execute sequentially on a core,
    so the banded state lives in a VMEM scratch that persists across
    steps — zero HBM traffic for the state during the chase;
  * the state uses the same FLAT 1-D shear layout as wavefront2
    (lb[i, q] at flat[i*W + q], W = 2b+1): one dynamic slice of the
    lane cover per step, reshaped (nW, stride) so all three window
    faces are static column-aligned views — no gathers;
  * per step the (nW, b) reflectors + taus stream out through a small
    blocked output (auto double-buffered by Mosaic), and the final
    band state is DMA'd back to HBM on the last step.

Reference parity: same reduction as ELPA2's band-to-tridiagonal stage
(solver_elpa.f90:448 two-stage path); the schedule, storage, and
kernelization are original TPU designs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from eigenkernel_tpu.ops.bulge import (ChaseResult, _banded_state,
                                       _band_to_tridiag_seq,
                                       _shard_chase_store)


def _chase_kernel(wf_ref, wfout_ref, vt_ref, state, sem, *,
                  n: int, b: int, W: int, T: int, nW: int, pad: int,
                  tau_max: int):
    tau = pl.program_id(0)

    @pl.when(tau == 0)
    def _load():
        cp = pltpu.make_async_copy(wf_ref, state, sem)
        cp.start()
        cp.wait()

    dtype = state.dtype
    stride = (4 * b - 1) * W
    cover = nW * stride
    chklen = 4 * b * b + 2 * b

    jarr = lax.broadcasted_iota(jnp.int32, (nW, 1), 0)[:, 0]
    t = (tau % 4) + 4 * jarr                             # (nW,)
    c = tau // 4 - jarr
    p0 = tau // 4 + 1 + (tau % 4) * b
    p = c + 1 + t * b
    jcol = jnp.where(t == 0, c, p - b)
    live = ((c >= 0) & (c <= n - 3) & (t <= T - 1)
            & (p < n - 1) & (jcol < n - 1))

    base = (pad + p0) * W
    cov = state[pl.ds(base, cover)].reshape(nW, stride)
    chunk = cov[:, :chklen]
    v1 = chunk[:, b - 1: b - 1 + 2 * b * b].reshape(nW, b, 2 * b)
    corner = chunk[:, b - 1 + 2 * b * b]                 # A[p+b-1, p+b-1]
    v2full = chunk[:, 2 * b * b + 2 * b:].reshape(nW, b, 2 * b)
    v2 = v2full[:, :, :b]                                # A[p+b+r, p+s]

    r_ = lax.broadcasted_iota(jnp.int32, (b, b), 0)
    c_ = lax.broadcasted_iota(jnp.int32, (b, b), 1)
    tril = r_ >= c_
    eye_b = (r_ == c_).astype(dtype)

    # pivot column: s = b for the single t==0 lane, s = 1 otherwise
    x = jnp.where((t == 0)[:, None], v1[:, :, b], v1[:, :, 1])
    x = x * live[:, None].astype(dtype)
    tail = x[:, 1:]
    sigma = jnp.sum(tail * tail, axis=1)
    zero_tail = sigma == 0
    alpha0 = x[:, 0]
    sgn = jnp.where(alpha0 >= 0, 1.0, -1.0).astype(dtype)
    beta = jnp.where(zero_tail, alpha0,
                     -sgn * jnp.sqrt(alpha0 * alpha0 + sigma))
    denom = jnp.where(zero_tail, 1.0, alpha0 - beta).astype(dtype)
    lv = jnp.logical_and(jnp.logical_not(zero_tail), live).astype(dtype)
    v = jnp.concatenate([lv[:, None], tail / denom[:, None] *
                         lv[:, None]], axis=1)           # (nW, b)
    tau_h = lv * jnp.where(zero_tail, 0.0,
                           (beta - alpha0) /
                           jnp.where(beta == 0, 1.0, beta))
    th = tau_h[:, None, None]

    # D block (full symmetric) from the stored lower part + corner
    dl = jnp.concatenate(
        [v1[:, :, b + 1:], jnp.zeros((nW, b, 1), dtype)], axis=2)
    dl = dl.at[:, b - 1, b - 1].set(corner)
    dl = jnp.where(tril, dl, 0.0)
    dfull = dl + jnp.swapaxes(dl, 1, 2) - eye_b * dl
    dv = jnp.sum(dfull * v[:, None, :], axis=2)          # (nW, b)
    vdv = jnp.sum(v * dv, axis=1)[:, None, None]
    dnew = (dfull - th * (v[:, :, None] * dv[:, None, :])
            - th * (dv[:, :, None] * v[:, None, :])
            + th * th * vdv * (v[:, :, None] * v[:, None, :]))
    # left strip (cols p-b-1..p-1): rows-of-S mix, valid for all r
    lft = v1[:, :, :b + 1]
    coef_l = jnp.sum(v[:, :, None] * lft, axis=1)        # (nW, b+1)
    lft = lft - th * (v[:, :, None] * coef_l[:, None, :])
    # bulge fill rows (right strip): cols-of-S mix
    coef_r = jnp.sum(v2 * v[:, None, :], axis=2)         # (nW, b)
    v2n = v2 - th * (coef_r[:, :, None] * v[:, None, :])

    d_store = jnp.where(tril[:, : b - 1], dnew[:, :, : b - 1],
                        v1[:, :, b + 1:])
    new_v1 = jnp.concatenate([lft, d_store], axis=2)
    new_v2 = jnp.concatenate([v2n, v2full[:, :, b:]], axis=2)
    chunk = chunk.at[:, b - 1: b - 1 + 2 * b * b].set(
        new_v1.reshape(nW, 2 * b * b))
    chunk = chunk.at[:, b - 1 + 2 * b * b].set(dnew[:, b - 1, b - 1])
    chunk = chunk.at[:, 2 * b * b + 2 * b:].set(
        new_v2.reshape(nW, 2 * b * b))
    cov = cov.at[:, :chklen].set(chunk)
    state[pl.ds(base, cover)] = cov.reshape(cover)

    vt_ref[0, :, : b] = v
    vt_ref[0, :, b] = tau_h

    @pl.when(tau == tau_max - 1)
    def _store():
        cp = pltpu.make_async_copy(state, wfout_ref, sem)
        cp.start()
        cp.wait()


def band_to_tridiag_pallas(band: jax.Array, bw: int, mesh=None,
                           interpret: bool = False) -> ChaseResult:
    """Drop-in for band_to_tridiag_wavefront2 with the VMEM-resident
    kernel.  Single-device only (the distributed path keeps the chunked
    schedule); falls back to the sequential core for tiny sizes."""
    n = band.shape[0]
    b = bw
    if n <= 2 or bw <= 1 or mesh is not None:
        return _band_to_tridiag_seq(band, bw, mesh=mesh)
    dtype = band.dtype
    W = 2 * b + 1
    T = n // b + 2
    nW = (T + 3) // 4 + 1
    pad = 2 * b + 2
    tau_max = 4 * (n - 3) + T
    p0_max = (tau_max - 1) // 4 + 1 + 3 * b
    rows_tot = pad + p0_max + nW * (4 * b - 1) + 2 * b + 2
    flatlen = rows_tot * W

    w = jnp.zeros((rows_tot, W), dtype)
    w = lax.dynamic_update_slice(w, _banded_state(band, b, None, W=W),
                                 (pad, 0))
    wflat = w.reshape(-1)

    kern = functools.partial(_chase_kernel, n=n, b=b, W=W, T=T, nW=nW,
                             pad=pad, tau_max=tau_max)
    wout, vt = pl.pallas_call(
        kern,
        grid=(tau_max,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, nW, b + 1), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((flatlen,), dtype),
            jax.ShapeDtypeStruct((tau_max, nW, b + 1), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((flatlen,), dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(wflat)

    w = wout.reshape(-1, W)
    d = w[pad:pad + n, 2 * b]
    e = w[pad + 1:pad + n, 2 * b - 1]

    # (c, t) addresses of each (tau, lane) reflector — pure index math,
    # recomputed here instead of streamed from the kernel
    taus = jnp.arange(tau_max)[:, None]
    jar = jnp.arange(nW)[None, :]
    t = (taus % 4) + 4 * jar
    c = taus // 4 - jar
    p = c + 1 + t * b
    jcol = jnp.where(t == 0, c, p - b)
    live = ((c >= 0) & (c <= n - 3) & (t <= T - 1)
            & (p < n - 1) & (jcol < n - 1))
    cs = jnp.where(live, c, n).reshape(-1)
    ts = jnp.minimum(t, T - 1).reshape(-1)

    vs = vt[:, :, :b].reshape(-1, b)
    ths = vt[:, :, b].reshape(-1)
    HV = jnp.zeros((n + 1, T, b), dtype).at[cs, ts, :].set(
        vs, mode="drop")
    HT = jnp.zeros((n + 1, T), dtype).at[cs, ts].set(
        ths, mode="drop")
    HV, HT = _shard_chase_store(HV[:n], HT[:n], None)
    return ChaseResult(d=d, e=e, HV=HV, HT=HT,
                       bw=jnp.asarray(bw, jnp.int32))
