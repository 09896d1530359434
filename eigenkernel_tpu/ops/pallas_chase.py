"""Pallas TPU kernel: the full bulge-chase scan resident on-chip.

The XLA wavefront2 chase (ops/bulge.py::band_to_tridiag_wavefront2) is
correct but latency-bound: each of the ~4n scan steps pays ~60-85 us of
XLA op dispatch + HBM round-trips for ~5 us of compute (measured on
v5e: n=4096 1.02 s, n=8192 2.84 s at bw=32).  This kernel runs the
ENTIRE chase as one pallas_call with grid=(tau_max,): TPU grid steps
execute sequentially on a core, so the banded state lives in a VMEM
scratch that persists across steps.

Mosaic-lowering design (hardware-probed constraints):

  * the state is the 2-D lower-banded array ``lb[i, q] = A[i, i-2b+q]``
    (W = 2b+1 data columns, rows padded to a 128-lane multiple: DMA
    slices must span full lane tiles) — NOT wavefront2's flat 1-D shear
    layout: Mosaic cannot reshape 1-D vectors to odd trailing dims, and
    dynamic 1-D indexing must be 1024-aligned.  2-D DMAs at *arbitrary
    dynamic row offsets* do lower, so each step DMAs the covering
    row-span of all wavefront windows in and out of a fixed scratch.
    The state itself lives in a VMEM scratch when it fits (~n<=6k at
    the padded width), else in the donated HBM output buffer
    (input_output_aliases) with per-step HBM<->VMEM cover DMAs;
  * each lane's window is ``4b-1`` consecutive band rows (consecutive
    wavefront lanes are exactly ``4b-1`` rows apart), so the cover
    reshapes ``(nW*(4b-1), W) -> (nW, 4b-1, W)`` — a leading-dim split,
    which Mosaic supports for any W;
  * the window faces are slope-1 diagonal runs in band storage:
    ``v1[r] = rows (r, r+1) cols [b-1-r, 3b-2-r]``, ``corner =
    (b-1, 2b)``, ``v2[r] = rows (b+r, b+r+1) cols [b-r, 3b-1-r]``.
    They are extracted from doubled rows (``concat(row_r, row_{r+1})``)
    with a logarithmic shear network: static lane rolls by powers of
    two + per-row iota masks (Mosaic lowers static rolls natively);
    the write-back uses the inverse shear and disjoint column masks;
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


def _shear(x, slope_shift, max_shift, direction):
    """Roll row r of ``x[..., r, :]`` by ``direction * slope_shift[r]``
    lanes using static power-of-two rolls + per-row masks."""
    out = x
    amt = 1
    while amt <= max_shift:
        rolled = jnp.roll(out, direction * amt, axis=-1)
        take = (slope_shift & amt) != 0
        out = jnp.where(take, rolled, out)
        amt *= 2
    return out


def _chase_kernel(wf_ref, wfout_ref, vt_ref, state_scr, cov, sem, *,
                  n: int, b: int, W: int, Wp: int, T: int, nW: int,
                  pad: int, tau_max: int, vmem_state: bool, dbg: int = 2):
    tau = pl.program_id(0)

    if vmem_state:
        state = state_scr

        @pl.when(tau == 0)
        def _load():
            cp = pltpu.make_async_copy(wf_ref, state, sem)
            cp.start()
            cp.wait()
    else:
        # wfout is donated from wf (input_output_aliases): the band
        # state lives in HBM in-place, no bulk copies at all
        state = wfout_ref

    dtype = cov.dtype
    R = nW * (4 * b - 1)

    # all per-lane scalars stay rank-2 (nW, 1): Mosaic's layout inference
    # CHECK-fails on rank-1 vectors in parts of this graph
    jarr = lax.broadcasted_iota(jnp.int32, (nW, 1), 0)
    t = (tau % 4) + 4 * jarr                             # (nW, 1)
    c = tau // 4 - jarr
    p0 = tau // 4 + 1 + (tau % 4) * b
    p = c + 1 + t * b
    jcol = jnp.where(t == 0, c, p - b)
    live = ((c >= 0) & (c <= n - 3) & (t <= T - 1)
            & (p < n - 1) & (jcol < n - 1))              # (nW, 1)

    # Cover load.  vmem mode: direct vector load at a dynamic ROW offset
    # (hardware-validated; the same slice as a DMA source faults the
    # worker — unaligned dynamic-offset async copies are broken on this
    # toolchain, bisected via EK_PALLAS_CHASE_DBG stages 10/11).  hbm
    # mode: per-step HBM<->VMEM DMA of an 8-row-ALIGNED cover (sublane
    # tile multiples) into the cov scratch; the 0..7 residual offset is
    # taken inside VMEM with the validated direct dynamic load/store.
    base = pad + p0
    if vmem_state:
        cover = state[pl.ds(base, R), :] if dbg != 10 \
            else jnp.zeros((R, Wp), dtype)
    else:
        base8 = (base // 8) * 8
        off = base - base8
        cpin = pltpu.make_async_copy(state.at[pl.ds(base8, R + 8), :],
                                     cov, sem)
        cpin.start()
        cpin.wait()
        cover = cov[pl.ds(off, R), :]

    def _writeback(new_flat):
        if vmem_state:
            state[pl.ds(base, R), :] = new_flat
        else:
            cov[pl.ds(off, R), :] = new_flat
            cpout = pltpu.make_async_copy(
                cov, state.at[pl.ds(base8, R + 8), :], sem)
            cpout.start()
            cpout.wait()

    def _final_store():
        if vmem_state:
            @pl.when(tau == tau_max - 1)
            def _store():
                cp = pltpu.make_async_copy(state, wfout_ref, sem)
                cp.start()
                cp.wait()

    if dbg in (0, 10, 11):             # skeleton only (fault bisection)
        vt_ref[0, :, :] = jnp.zeros((nW, b + 1), dtype)
        if dbg == 0:
            _writeback(cover)
        _final_store()
        return

    win = cover.reshape(nW, 4 * b - 1, Wp)

    r1 = lax.broadcasted_iota(jnp.int32, (b, 1), 0)      # row index r
    shearA = b - 1 - r1                                   # shifts 0..b-1
    # Mosaic layout discipline: every slice below starts at offset 0 on
    # non-concat dims (odd-offset slices are realigned via roll-then-
    # slice) and element extracts are masked reductions — offset-carrying
    # layouts fail tpu.concatenate lowering.
    win_dn = jnp.roll(win, -1, axis=1)                    # rows shifted up 1
    # doubled rows: drowA[r] = rows (r, r+1), drowB[r] = rows (b+r, b+r+1)
    # (logical W-wide rows — the flat wrap point must sit at lane W)
    drowA = jnp.concatenate([win[:, :b, :W], win_dn[:, :b, :W]], axis=2)
    drowB = jnp.concatenate([win[:, b:2 * b, :W],
                             win_dn[:, b:2 * b, :W]], axis=2)
    # v1[r, c] = drowA[r, (b-1-r) + c];  v2full[r, c] = drowB[r, (b-r) + c]
    v1 = _shear(drowA, shearA, b - 1, -1)[:, :, :2 * b]
    v2full = _shear(jnp.roll(drowB, -1, axis=-1), shearA, b - 1,
                    -1)[:, :, :2 * b]
    rw_ = lax.broadcasted_iota(jnp.int32, (b, Wp), 0)
    cw_ = lax.broadcasted_iota(jnp.int32, (b, Wp), 1)
    corner = jnp.sum(jnp.sum(                             # A[p+b-1, p+b-1]
        win[:, :b, :] * ((rw_ == b - 1) & (cw_ == 2 * b)).astype(dtype),
        axis=2), axis=1, keepdims=True)                  # (nW, 1)
    v2 = v2full[:, :, :b]                                 # A[p+b+r, p+s]

    r_ = lax.broadcasted_iota(jnp.int32, (b, b), 0)
    c_ = lax.broadcasted_iota(jnp.int32, (b, b), 1)
    tril = r_ >= c_
    eye_b = (r_ == c_).astype(dtype)
    last_rc = (r_ == b - 1) & (c_ == b - 1)

    # pivot column x[r] = v1[r, s], s = b for the t==0 lane else 1.
    # In window coords that is the no-wrap diagonal win[r, (s+b-1) - r],
    # so extract straight from win with a masked reduce (keeps layouts
    # offset-free — jnp.roll on small 2-D arrays lowers to
    # tpu.concatenate, which rejects offset-carrying operands).
    colx = jnp.where(t == 0, 2 * b - 1, b)[:, :, None]   # (nW, 1, 1)
    xmask = (cw_ == colx - rw_) & (rw_ < b)
    x = jnp.sum(win[:, :b, :] * xmask.astype(dtype), axis=2)
    x = x * live.astype(dtype)                           # (nW, b)
    l1 = lax.broadcasted_iota(jnp.int32, (1, b), 1)
    xt = x * (l1 > 0).astype(dtype)                      # tail part of x
    sigma = jnp.sum(xt * xt, axis=1, keepdims=True)      # (nW, 1)
    zero_tail = sigma == 0
    alpha0 = x[:, :1]                                    # (nW, 1)
    sgn = jnp.where(alpha0 >= 0, 1.0, -1.0).astype(dtype)
    beta = jnp.where(zero_tail, alpha0,
                     -sgn * jnp.sqrt(alpha0 * alpha0 + sigma))
    denom = jnp.where(zero_tail, 1.0, alpha0 - beta).astype(dtype)
    lv = jnp.logical_and(jnp.logical_not(zero_tail), live).astype(dtype)
    v = jnp.where(l1 == 0, lv, x / denom * lv)           # (nW, b)
    tau_h = lv * jnp.where(zero_tail, 0.0,
                           (beta - alpha0) /
                           jnp.where(beta == 0, 1.0, beta))  # (nW, 1)
    th = tau_h[:, :, None]                               # (nW, 1, 1)

    if dbg == 1:                       # extraction+reflectors, no write-back
        vt_ref[0, :, :b] = v
        vt_ref[0, :, b:] = tau_h
        _writeback(cover)
        _final_store()
        return

    # D block (full symmetric) from the stored lower part + corner
    v1hi = jnp.roll(v1, -(b + 1), axis=-1)[:, :, : b - 1]
    dl = jnp.concatenate([v1hi, jnp.zeros((nW, b, 1), dtype)], axis=2)
    dl = jnp.where(last_rc, corner[:, :, None], dl)
    dl = jnp.where(tril, dl, 0.0)
    dfull = dl + jnp.swapaxes(dl, 1, 2) - eye_b * dl
    dv = jnp.sum(dfull * v[:, None, :], axis=2)          # (nW, b)
    vdv = jnp.sum(v * dv, axis=1, keepdims=True)[:, :, None]
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

    d_store = jnp.where(tril[:, : b - 1], dnew[:, :, : b - 1], v1hi)
    new_v1 = jnp.concatenate([lft, d_store], axis=2)      # (nW, b, 2b)
    v2hi = jnp.roll(v2full, -b, axis=-1)[:, :, :b]
    new_v2 = jnp.concatenate([v2n, v2hi], axis=2)

    # ---- inverse shear write-back into the window rows 0..2b-1 ----
    Bw = max(2 * W, Wp)        # >= Wp for the FH slice, >= W+b for wrap
    zpad = jnp.zeros((nW, b, Bw - 2 * b), dtype)
    backA = _shear(jnp.concatenate([new_v1, zpad], axis=2),
                   shearA, b - 1, +1)
    backB = jnp.roll(_shear(jnp.concatenate([new_v2, zpad], axis=2),
                            shearA, b - 1, +1), 1, axis=-1)
    q_ = lax.broadcasted_iota(jnp.int32, (b, Wp), 1)
    rq = lax.broadcasted_iota(jnp.int32, (b, Wp), 0)
    # rows 0..b-1: first halves FH_A (cols b-1-r .. 3b-2-r, capped at W-1)
    # + wrapped second halves SH_A[r-1] (cols 0 .. b-2-r) + corner
    mFHA = (q_ >= b - 1 - rq) & (q_ <= 3 * b - 2 - rq) & (q_ < W)
    mSHA = (rq >= 1) & (q_ <= b - 2 - rq)
    fhA = backA[:, :, :Wp]
    backA_hi = jnp.roll(backA, -W, axis=-1)[:, :, :Wp]
    shA = jnp.concatenate([jnp.zeros((nW, 1, Wp), dtype),
                           backA_hi[:, : b - 1, :]], axis=1)
    rowsA = jnp.where(mFHA, fhA, win[:, :b, :])
    rowsA = jnp.where(mSHA, shA, rowsA)
    mCor = (rq == b - 1) & (q_ == 2 * b)
    corner_new = jnp.sum(jnp.sum(dnew * last_rc.astype(dtype), axis=2),
                         axis=1, keepdims=True)          # (nW, 1)
    rowsA = jnp.where(mCor, corner_new[:, :, None], rowsA)
    # rows b..2b-1: FH_B (cols b-r .. 3b-1-r) + SH_B[r-1] (cols 0..b-1-r)
    mFHB = (q_ >= b - rq) & (q_ <= 3 * b - 1 - rq) & (q_ < W)
    mSHB = (rq >= 1) & (q_ <= b - 1 - rq)
    fhB = backB[:, :, :Wp]
    backB_hi = jnp.roll(backB, -W, axis=-1)[:, :, :Wp]
    shB = jnp.concatenate([jnp.zeros((nW, 1, Wp), dtype),
                           backB_hi[:, : b - 1, :]], axis=1)
    rowsB = jnp.where(mFHB, fhB, win[:, b:2 * b, :])
    rowsB = jnp.where(mSHB, shB, rowsB)

    new_win = jnp.concatenate([rowsA, rowsB, win[:, 2 * b:, :]], axis=1)
    _writeback(new_win.reshape(R, Wp))

    vt_ref[0, :, :b] = v
    vt_ref[0, :, b:] = tau_h

    _final_store()


def band_to_tridiag_pallas(band: jax.Array, bw: int, mesh=None,
                           interpret: bool = False) -> ChaseResult:
    """Drop-in for band_to_tridiag_wavefront2 with the VMEM-resident
    kernel.  Single-device only (the distributed path keeps the chunked
    schedule); falls back to the sequential core for tiny sizes."""
    n = band.shape[0]
    b = bw
    if n <= 2 or bw < 4 or mesh is not None:
        # bw>=4 keeps the trailing state margin >= the 8-row DMA
        # alignment slack the hbm mode needs
        return _band_to_tridiag_seq(band, bw, mesh=mesh)
    dtype = band.dtype
    W = 2 * b + 1
    Wp = ((W + 127) // 128) * 128      # DMA slices span full lane tiles
    T = n // b + 2
    nW = (T + 3) // 4 + 1
    pad = 2 * b + 2
    tau_max = 4 * (n - 3) + T
    p0_max = (tau_max - 1) // 4 + 1 + 3 * b
    R = nW * (4 * b - 1)
    rows_tot = pad + p0_max + R + 2 * b + 2

    import os
    mode = os.environ.get("EK_PALLAS_CHASE_STATE", "")
    if mode not in ("vmem", "hbm"):
        # the state scratch must fit ~16 MB VMEM with headroom (vmem mode
        # needs no cover scratch: it loads/stores the cover directly).
        # NOTE rows are physically lane-padded to 128 whatever W is, so
        # the budget is ~rows_tot*512 B and caps out near n=8192.
        if rows_tot * max(Wp, 128) * band.dtype.itemsize >= 10 * 2 ** 20:
            # hbm mode's per-step dynamic-offset DMAs crash the TPU
            # worker on this toolchain (hardware-bisected 2026-08-17);
            # until an aligned-DMA variant lands, fall back to the XLA
            # wavefront for states beyond VMEM capacity.
            if not interpret:
                from eigenkernel_tpu.ops.bulge import \
                    band_to_tridiag_wavefront2
                return band_to_tridiag_wavefront2(band, bw, mesh=mesh)
            mode = "hbm"
        else:
            mode = "vmem"
    vmem_state = mode == "vmem"

    w = jnp.zeros((rows_tot, Wp), dtype)
    w = lax.dynamic_update_slice(w, _banded_state(band, b, None, W=W),
                                 (pad, 0))

    kern = functools.partial(_chase_kernel, n=n, b=b, W=W, Wp=Wp, T=T,
                             nW=nW, pad=pad, tau_max=tau_max,
                             vmem_state=vmem_state,
                             dbg=int(os.environ.get(
                                 "EK_PALLAS_CHASE_DBG", "2")))
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
            jax.ShapeDtypeStruct((rows_tot, Wp), dtype),
            jax.ShapeDtypeStruct((tau_max, nW, b + 1), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows_tot if vmem_state else 1,
                        Wp), dtype),
            pltpu.VMEM((1 if vmem_state else R + 8, Wp), dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        input_output_aliases={} if vmem_state else {0: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(w)

    d = wout[pad:pad + n, 2 * b]
    e = wout[pad + 1:pad + n, 2 * b - 1]

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
