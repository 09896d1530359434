"""Pallas TPU kernel: the full bulge-chase scan resident on-chip.

The XLA wavefront2 chase (ops/bulge.py::band_to_tridiag_wavefront2) is
correct but latency-bound: each of the ~4n scan steps pays ~60-85 us of
XLA op dispatch + HBM round-trips for ~5 us of compute (measured on
v5e: n=4096 1.02 s, n=8192 2.84 s at bw=32).  This kernel runs the
ENTIRE chase as one pallas_call with grid=(tau_max,): TPU grid steps
execute sequentially on a core, so the banded state lives in a VMEM
scratch that persists across steps.

Mosaic-lowering design (hardware-probed constraints, 2026-08-17):

  * the state is the 2-D lower-banded array ``lb[i, q] = A[i, i-2b+q]``
    (W = 2b+1 data columns, lane-padded to Wp=128 multiples) — NOT
    wavefront2's flat 1-D shear layout: Mosaic cannot reshape 1-D
    vectors to odd trailing dims, and dynamic 1-D indexing must be
    1024-aligned;
  * dynamic-ROW-offset direct vector load/store on a VMEM ref
    (``state[pl.ds(dyn, rows), :]``) lowers AND runs; the same slice as
    a ``make_async_copy`` source/target compiles but CRASHES the TPU
    worker (bisected via the EK_PALLAS_CHASE_DBG=10/11 skeleton stages;
    8-row-aligned DMA offsets crash too).  So the state must be VMEM-
    resident — beyond VMEM capacity (~n=8192 at the padded width) the
    dispatcher falls back to the XLA wavefront;
  * each wavefront lane's window is ``4b-1`` consecutive band rows
    (consecutive lanes are exactly ``4b-1`` rows apart) of which the
    chase only touches rows ``0..2b``; lanes are processed in GROUPS of
    G with per-lane loads of exactly those rows — the scoped-VMEM live
    set is O(G * b * Wp) instead of O(nW * b * Wp), which is what blew
    the 16 MB scoped-vmem limit at n>=4096 as one monolithic step
    ("Scoped allocation 17.96M > 16.00M", evidence/), and the
    pass-through rows ``2b+1..4b-2`` are never moved at all;
  * the window faces are slope-1 diagonal runs in band storage; they
    are extracted from doubled rows (``concat(row_r, row_{r+1})``)
    with a logarithmic shear network: static lane rolls by powers of
    two + per-row iota masks (Mosaic lowers static rolls natively);
    the write-back uses the inverse shear and disjoint column masks;
  * per step the (nW, b) reflectors + taus stream out through a small
    blocked output (auto double-buffered by Mosaic), and the band
    state is bulk-DMA'd HBM->VMEM at tau=0 and back on the last step.

Reference parity: same reduction as ELPA2's band-to-tridiagonal stage
(solver_elpa.f90:448 two-stage path); the schedule, storage, and
kernelization are original TPU designs.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from eigenkernel_tpu.ops._pallas_x32 import kernel_trace_ctx
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


def _shear_roll(x, b, direction):
    """Same shear (row r by ``direction * (b-1-(r%b))`` lanes) as ONE
    strided hardware rotate per b-row half (``tpu.DynamicRotate`` with
    per-sublane stride) instead of log2(b) roll+select passes — the
    shear passes are the dominant per-tau compute (dbg ladder,
    evidence/CHASE_AB_r3s6.md).  Cyclic identities: left by (b-1-r) ==
    roll by r-(b-1) (mod L) == shift (L-b+1), stride +1; right uses
    stride L-1 (== -1 mod L).  EK_PALLAS_CHASE_SHEAR=roll selects it."""
    L = x.shape[-1]
    xA, xB = x[:, :b, :], x[:, b:, :]
    if direction < 0:
        sh, st = (L - b + 1) % L, 1
    else:
        sh, st = b - 1, L - 1
    outA = pltpu.roll(xA, sh, 2, stride=st, stride_axis=1)
    outB = pltpu.roll(xB, sh, 2, stride=st, stride_axis=1)
    return jnp.concatenate([outA, outB], axis=1)


def _chase_group(win, t, live, *, n: int, b: int, W: int, Wp: int,
                 dtype, shear_roll: bool = False, algebra: bool = True):
    """One wavefront step for a GROUP of G lanes.

    ``win``: (G, 2b+1, Wp) — rows 0..2b of each lane's band window.
    ``t``/``live``: (G, 1) sweep index / liveness mask.
    Returns (new_rows (G, 2b, Wp) to store back, v (G, b), tau_h (G, 1)).
    ``algebra=False`` (the dbg=3 profiling stage) runs the shear
    extract + inverse-shear write-back but skips the reflector/D-block
    middle — isolating the shear-network share of the compute.
    """
    G = win.shape[0]
    rr = lax.broadcasted_iota(jnp.int32, (2 * b, 1), 0)  # merged row idx
    shear2 = b - 1 - (rr % b)
    # Mosaic layout discipline: lane-dim slices below start at offset 0
    # (odd-offset lane slices are realigned via roll-then-slice) and
    # element extracts are masked reductions — offset-carrying layouts
    # fail tpu.concatenate lowering.
    win_dn = jnp.roll(win, -1, axis=1)                    # rows shifted up 1
    # doubled rows: drow[r] = rows (r, r+1) for r < b (the A/v1 half)
    # and rows (b+r', b+r'+1) for r = b+r' (the B/v2 half) — ONE merged
    # (G, 2b, netw) array so the shear network runs once, not twice (the
    # v2 half's extra -1 lane shift is folded in as a masked pre-roll;
    # both halves then shear by the same b-1-(r mod b) schedule).
    # Logical W-wide rows: the flat wrap point must sit at lane W.
    #
    # Network width: the left-shear for row r reads drow lanes
    # [shift_r, shift_r + 2b) with shift_r <= b-1, i.e. lanes < 3b-1 —
    # so for 3b+1 <= Wp the whole network runs at EXACTLY one lane tile
    # (Wp=128) instead of 2W->256: the shear roll+select passes are the
    # dominant per-tau compute (dbg ladder at 8192: loads 0.43 s,
    # +stores 0.41 s, full 1.77 s), and this halves their width.  The
    # wrap contamination from 128-wide rolls stays in lanes >= 3b-1,
    # which nothing reads.
    netw = Wp if 3 * b + 2 <= Wp else 2 * W
    drow = jnp.concatenate([win[:, :2 * b, :W],
                            win_dn[:, :2 * b, :netw - W]], axis=2)
    drow = jnp.where(rr >= b, jnp.roll(drow, -1, axis=-1), drow)
    shear_f = (lambda x, d: _shear_roll(x, b, d)) if shear_roll else \
        (lambda x, d: _shear(x, shear2, b - 1, d))
    sheared = shear_f(drow, -1)[:, :, :2 * b]
    if not algebra:
        # dbg=3: shears + write-back masks only — new12 == sheared means
        # the stored rows reconstruct the input exactly (identity pass)
        zv = jnp.zeros((G, b), dtype)
        zt = jnp.zeros((G, 1), dtype)
        Bw0 = netw if netw >= Wp else max(2 * W, Wp)
        zpad0 = jnp.zeros((G, 2 * b, Bw0 - 2 * b), dtype)
        back0 = shear_f(jnp.concatenate([sheared, zpad0], axis=2), +1)
        back0 = jnp.where(rr >= b, jnp.roll(back0, 1, axis=-1), back0)
        return (jnp.concatenate(
            [back0[:, :b, :Wp], back0[:, b:2 * b, :Wp]], axis=1)[:, :, :Wp],
            zv, zt)
    v1 = sheared[:, :b, :]
    v2full = sheared[:, b:2 * b, :]
    rw_ = lax.broadcasted_iota(jnp.int32, (b, Wp), 0)
    cw_ = lax.broadcasted_iota(jnp.int32, (b, Wp), 1)
    cw1 = lax.broadcasted_iota(jnp.int32, (1, Wp), 1)
    corner = jnp.sum(                                     # A[p+b-1, p+b-1]
        win[:, b - 1:b, :] * (cw1 == 2 * b).astype(dtype),
        axis=2)                                           # (G, 1)
    v2 = v2full[:, :, :b]                                 # A[p+b+r, p+s]

    r_ = lax.broadcasted_iota(jnp.int32, (b, b), 0)
    c_ = lax.broadcasted_iota(jnp.int32, (b, b), 1)
    tril = r_ >= c_
    eye_b = (r_ == c_).astype(dtype)
    last_rc = (r_ == b - 1) & (c_ == b - 1)

    # pivot column x[r] = v1[r, s], s = b for the t==0 lane else 1.
    # In window coords that is the no-wrap diagonal win[r, (s+b-1) - r],
    # extracted straight from win with a masked reduce.
    # explicit int32: weak-typed Python ints select as int64 under
    # jax_enable_x64 and Mosaic's 64-bit convert lowering recurses
    # forever (r4 mixed-eigensx RecursionError)
    colx = jnp.where(t == 0, jnp.int32(2 * b - 1),
                     jnp.int32(b))[:, :, None]           # (G, 1, 1)
    xmask = (cw_ == colx - rw_) & (rw_ < b)
    x = jnp.sum(win[:, :b, :] * xmask.astype(dtype), axis=2)
    x = x * live.astype(dtype)                           # (G, b)
    l1 = lax.broadcasted_iota(jnp.int32, (1, b), 1)
    xt = x * (l1 > 0).astype(dtype)                      # tail part of x
    sigma = jnp.sum(xt * xt, axis=1, keepdims=True)      # (G, 1)
    zero_tail = sigma == 0
    alpha0 = x[:, :1]                                    # (G, 1)
    one = jnp.asarray(1.0, dtype)  # not weak 1.0: f64 select under x64
    sgn = jnp.where(alpha0 >= 0, one, -one)
    beta = jnp.where(zero_tail, alpha0,
                     -sgn * jnp.sqrt(alpha0 * alpha0 + sigma))
    denom = jnp.where(zero_tail, 1.0, alpha0 - beta).astype(dtype)
    lv = jnp.logical_and(jnp.logical_not(zero_tail), live).astype(dtype)
    v = jnp.where(l1 == 0, lv, x / denom * lv)           # (G, b)
    tau_h = lv * jnp.where(zero_tail, 0.0,
                           (beta - alpha0) /
                           jnp.where(beta == 0, 1.0, beta))  # (G, 1)
    th = tau_h[:, :, None]                               # (G, 1, 1)

    # D block (full symmetric) from the stored lower part + corner
    v1hi = jnp.roll(v1, -(b + 1), axis=-1)[:, :, : b - 1]
    dl = jnp.concatenate([v1hi, jnp.zeros((G, b, 1), dtype)], axis=2)
    dl = jnp.where(last_rc, corner[:, :, None], dl)
    dl = jnp.where(tril, dl, 0.0)
    dfull = dl + jnp.swapaxes(dl, 1, 2) - eye_b * dl
    dv = jnp.sum(dfull * v[:, None, :], axis=2)          # (G, b)
    vdv = jnp.sum(v * dv, axis=1, keepdims=True)[:, :, None]
    dnew = (dfull - th * (v[:, :, None] * dv[:, None, :])
            - th * (dv[:, :, None] * v[:, None, :])
            + th * th * vdv * (v[:, :, None] * v[:, None, :]))
    # left strip (cols p-b-1..p-1): rows-of-S mix, valid for all r
    lft = v1[:, :, :b + 1]
    coef_l = jnp.sum(v[:, :, None] * lft, axis=1)        # (G, b+1)
    lft = lft - th * (v[:, :, None] * coef_l[:, None, :])
    # bulge fill rows (right strip): cols-of-S mix
    coef_r = jnp.sum(v2 * v[:, None, :], axis=2)         # (G, b)
    v2n = v2 - th * (coef_r[:, :, None] * v[:, None, :])

    d_store = jnp.where(tril[:, : b - 1], dnew[:, :, : b - 1], v1hi)
    new_v1 = jnp.concatenate([lft, d_store], axis=2)      # (G, b, 2b)
    v2hi = jnp.roll(v2full, -b, axis=-1)[:, :, :b]
    new_v2 = jnp.concatenate([v2n, v2hi], axis=2)

    # ---- inverse shear write-back into the window rows 0..2b-1 ----
    # (merged A/B halves, one shear network — see the extract above).
    # Same one-lane-tile width: the right-shear needs lanes < 3b, the
    # FH masks read lanes < W, and the SH wrap roll by -W sources lanes
    # < W + b — all < Wp for 3b+2 <= Wp; right-roll wrap-ins come from
    # the zero padding, not garbage.
    Bw = netw if netw >= Wp else max(2 * W, Wp)
    zpad = jnp.zeros((G, 2 * b, Bw - 2 * b), dtype)
    new12 = jnp.concatenate([new_v1, new_v2], axis=1)     # (G, 2b, 2b)
    back = shear_f(jnp.concatenate([new12, zpad], axis=2), +1)
    back = jnp.where(rr >= b, jnp.roll(back, 1, axis=-1), back)
    backA = back[:, :b, :]
    backB = back[:, b:2 * b, :]
    q_ = lax.broadcasted_iota(jnp.int32, (b, Wp), 1)
    rq = lax.broadcasted_iota(jnp.int32, (b, Wp), 0)
    # rows 0..b-1: first halves FH_A (cols b-1-r .. 3b-2-r, capped at W-1)
    # + wrapped second halves SH_A[r-1] (cols 0 .. b-2-r) + corner
    mFHA = (q_ >= b - 1 - rq) & (q_ <= 3 * b - 2 - rq) & (q_ < W)
    mSHA = (rq >= 1) & (q_ <= b - 2 - rq)
    fhA = backA[:, :, :Wp]
    backA_hi = jnp.roll(backA, -W, axis=-1)[:, :, :Wp]
    shA = jnp.concatenate([jnp.zeros((G, 1, Wp), dtype),
                           backA_hi[:, : b - 1, :]], axis=1)
    rowsA = jnp.where(mFHA, fhA, win[:, :b, :])
    rowsA = jnp.where(mSHA, shA, rowsA)
    mCor = (rq == b - 1) & (q_ == 2 * b)
    corner_new = jnp.sum(jnp.sum(dnew * last_rc.astype(dtype), axis=2),
                         axis=1, keepdims=True)          # (G, 1)
    rowsA = jnp.where(mCor, corner_new[:, :, None], rowsA)
    # rows b..2b-1: FH_B (cols b-r .. 3b-1-r) + SH_B[r-1] (cols 0..b-1-r)
    mFHB = (q_ >= b - rq) & (q_ <= 3 * b - 1 - rq) & (q_ < W)
    mSHB = (rq >= 1) & (q_ <= b - 1 - rq)
    fhB = backB[:, :, :Wp]
    backB_hi = jnp.roll(backB, -W, axis=-1)[:, :, :Wp]
    shB = jnp.concatenate([jnp.zeros((G, 1, Wp), dtype),
                           backB_hi[:, : b - 1, :]], axis=1)
    rowsB = jnp.where(mFHB, fhB, win[:, b:2 * b, :])
    rowsB = jnp.where(mSHB, shB, rowsB)

    return jnp.concatenate([rowsA, rowsB], axis=1), v, tau_h


def _chase_kernel(wf_ref, wfout_ref, vt_ref, state, sem, *,
                  n: int, b: int, W: int, Wp: int, T: int, nW: int,
                  pad: int, tau_max: int, group: tuple, span_io: bool,
                  fuse: int, clamp: int = 0, dbg: int = 2,
                  align_c: int = 0, shear_roll: bool = False):
    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _load():
        cp = pltpu.make_async_copy(wf_ref, state, sem)
        cp.start()
        cp.wait()

    dtype = state.dtype
    stride = 4 * b - 1

    # `fuse` consecutive taus per grid step amortize the ~6 us/step grid
    # overhead; taus past tau_max have ALL lanes dead (t<=T-1 and c>=0
    # are then disjoint), and dead-lane write-backs are identities, so
    # the padded tail needs no guard.
    for dt in range(fuse):
        tau = pid * fuse + dt
        base = pad + tau // 4 + 1 + (tau % 4) * b        # p0 row offset

        if dbg == 10:                  # no dynamic access (bisection)
            vt_ref[0, dt, :, :] = jnp.zeros((nW, b + 1), dtype)
            continue
        # lane groups: bounded scoped-VMEM live set per group
        g0 = 0
        for G in group:
            jarr = g0 + lax.broadcasted_iota(jnp.int32, (G, 1), 0)
            t = (tau % 4) + 4 * jarr                     # (G, 1)
            c = tau // 4 - jarr
            p = c + 1 + t * b
            jcol = jnp.where(t == 0, c, p - b)
            live = ((c >= 0) & (c <= n - 3) & (t <= T - 1)
                    & (p < n - 1) & (jcol < n - 1))      # (G, 1)

            # Cover IO, two hardware-validated forms (both single-lane-
            # tile only, Wp=128): 'span' = ONE contiguous (G*stride, Wp)
            # load/store per group + leading-dim reshape; 'lane' =
            # per-lane loads of exactly the touched rows 0..2b
            # (default: measured 30.3 vs 46.9 us/step at 4096/32 — the
            # span form moves the 2b-2 pass-through rows too).
            if align_c:
                # tile-ALIGNED cover IO: the state is (tiles, 8, Wp), so
                # every dynamic slice starts on an (8, 128) tile boundary
                # by construction (the plain 2-D form's offsets slide by
                # +1 per step through every sublane residue, which the
                # lane/span timings suggest lowers to row-granular
                # copies).  The 0..7 residual offset is applied in-vreg
                # with masked static sublane rolls (same trick as the
                # _shear lane network).  Write-back rows outside the
                # window are either this lane's own pass-through rows or
                # structurally-zero padding (see clamp note above) — the
                # roll-inverse makes their re-store an exact identity.
                C8 = align_c * 8
                off_v = jnp.minimum(base + jarr * stride, clamp)
                r_arr = (off_v % 8)[:, :, None]          # (G, 1, 1)
                offs = [jnp.minimum(base + (g0 + i) * stride, clamp)
                        for i in range(G)]
                t0s = [o // 8 for o in offs]
                covs = [state[pl.ds(t0s[i], align_c), :, :]
                        .reshape(1, C8, Wp) for i in range(G)]
                cov = covs[0] if G == 1 else jnp.concatenate(covs, axis=0)
                rot = cov
                for amt in (1, 2, 4):
                    take = (r_arr & amt) != 0
                    rot = jnp.where(take, jnp.roll(rot, -amt, axis=1), rot)
                win = rot[:, :2 * b + 1, :]
            elif span_io:
                spn = state[pl.ds(base + g0 * stride, G * stride), :]
                w3 = spn.reshape(G, stride, Wp)
                win = w3[:, :2 * b + 1, :]
                offs = None
            else:
                # small-state mode (clamp > 0): rows beyond the live
                # range [pad, pad+n+2b) exist only for DEAD lanes, whose
                # write-back is an identity, so their offsets clamp to
                # the state tail (reads-then-identical-writes are
                # harmless even when clamped lanes overlap live rows)
                offs = [base + (g0 + i) * stride for i in range(G)]
                if clamp:
                    offs = [jnp.minimum(o, clamp) for o in offs]
                blocks = [state[pl.ds(o, 2 * b + 1), :]
                          .reshape(1, 2 * b + 1, Wp) for o in offs]
                win = blocks[0] if G == 1 else \
                    jnp.concatenate(blocks, axis=0)

            if dbg in (0, 11):
                new_rows = jnp.concatenate([win[:, :b, :],
                                            win[:, b:2 * b, :]], axis=1)
                v = jnp.zeros((G, b), dtype)
                tau_h = jnp.zeros((G, 1), dtype)
            else:
                new_rows, v, tau_h = _chase_group(
                    win, t, live, n=n, b=b, W=W, Wp=Wp, dtype=dtype,
                    shear_roll=shear_roll, algebra=dbg != 3)

            if dbg != 11:
                if align_c:
                    C8 = align_c * 8
                    frame = jnp.concatenate(
                        [new_rows, rot[:, 2 * b:, :]], axis=1)
                    for amt in (1, 2, 4):
                        take = (r_arr & amt) != 0
                        frame = jnp.where(take,
                                          jnp.roll(frame, amt, axis=1),
                                          frame)
                    for i in range(G):
                        state[pl.ds(t0s[i], align_c), :, :] = \
                            frame[i].reshape(align_c, 8, Wp)
                elif span_io:
                    new_span = jnp.concatenate(
                        [new_rows, w3[:, 2 * b:, :]], axis=1)
                    state[pl.ds(base + g0 * stride, G * stride), :] = \
                        new_span.reshape(G * stride, Wp)
                else:
                    for i in range(G):
                        state[pl.ds(offs[i], 2 * b), :] = new_rows[i]
            vt_ref[0, dt, g0:g0 + G, :b] = v
            vt_ref[0, dt, g0:g0 + G, b:] = tau_h
            g0 += G

    @pl.when(pid == pl.num_programs(0) - 1)
    def _store():
        cp = pltpu.make_async_copy(state, wfout_ref, sem)
        cp.start()
        cp.wait()


def band_to_tridiag_pallas(band: jax.Array, bw: int, mesh=None,
                           interpret: bool = False) -> ChaseResult:
    """Drop-in for band_to_tridiag_wavefront2 with the VMEM-resident
    kernel.  Single-device only (the distributed path keeps the chunked
    schedule); falls back to the sequential core for tiny sizes and to
    the XLA wavefront beyond VMEM capacity."""
    n = band.shape[0]
    b = bw
    if n <= 2 or bw < 2 or mesh is not None:
        return _band_to_tridiag_seq(band, bw, mesh=mesh)
    dtype = band.dtype
    W = 2 * b + 1
    Wp = ((W + 127) // 128) * 128      # lane-tile padded state width
    T = n // b + 2
    nW = (T + 3) // 4 + 1
    pad = 2 * b + 2
    tau_max = 4 * (n - 3) + T
    p0_max = (tau_max - 1) // 4 + 1 + 3 * b
    stride = 4 * b - 1
    rows_full = pad + p0_max + nW * stride + 2 * b + 2
    # Live lanes never touch rows beyond pad+n+2b: a lane's window START
    # is pad + p (its bulge position) and live requires p < n-1, so rows
    # past that belong only to DEAD lanes — whose write-back is an
    # identity.  The small state keeps just the live range and CLAMPS
    # per-lane offsets into it (span IO can't clamp: a group mixing live
    # and dead lanes would shift its live windows).
    rows_small = pad + n + 2 * b + 8
    isz = band.dtype.itemsize
    # VMEM budget for the persistent state scratch (hardware-validated
    # to n=16384 at bw=32, ~8.5 MB; the scoped-compute live set is
    # bounded separately by the lane-group target).  EK_PALLAS_CHASE_VMEM
    # (MB) raises it for larger n — a too-big value fails at COMPILE
    # time (safe), not at run time.
    budget = int(os.environ.get("EK_PALLAS_CHASE_VMEM", "10")) * 2 ** 20
    clamp = 0
    # lane IO + small state is the default (measured fastest: 30.3 vs
    # 46.9 us/step at 4096/32, and half the VMEM -> more scoped
    # headroom).  EK_PALLAS_CHASE_IO=span selects the full-state span
    # form (clamping can't mix with span: a group mixing live and dead
    # lanes would shift its live windows).
    span_io = os.environ.get("EK_PALLAS_CHASE_IO", "lane") == "span"
    small = not span_io or \
        os.environ.get("EK_PALLAS_CHASE_SMALL", "0") not in ("", "0")
    # tile-aligned cover IO (EK_PALLAS_CHASE_ALIGN): state stored as
    # (tiles, 8, Wp) so every dynamic slice is (8,128)-tile-aligned by
    # construction; implies lane IO + small state.  The clamp target
    # must start at or past pad+n so clamped dead-lane covers touch only
    # the structurally-zero padding rows (kept bit-zero by the exact-
    # zero reflector components), making their stale re-store harmless.
    align_c = 0
    # default from the r3s7 hardware A/B (evidence/CHASE_AB_r3s6.md +
    # /tmp/tpuq exp23): tile-aligned cover IO wins up to n=8192 (4096:
    # 0.43 vs 0.98 s; 8192: 0.50 vs 1.73 s) but loses at 16384 (10.5 vs
    # 4.4 s — its per-group cover grows with the clamp span and the
    # validated lane-group cap is lower), so align at n<=8192, lane above.
    align_env = os.environ.get("EK_PALLAS_CHASE_ALIGN", "")
    align_on = (align_env not in ("", "0")) if align_env != "" \
        else (n <= 8192
              and os.environ.get("EK_PALLAS_CHASE_IO", "") == "")
    if align_on:
        align_c = -(-(2 * b + 8) // 8)
        rows_tot = -(-(pad + n + 8 * align_c) // 8) * 8
        clamp = rows_tot - 8 * align_c
        span_io = False
    elif small:
        rows_tot = rows_small
        clamp = rows_tot - (2 * b + 1)
        span_io = False
    else:
        rows_tot = rows_full

    if ((rows_tot * Wp * isz >= budget or Wp > 128) and not interpret):
        # Two hardware-probed limits: (a) dynamic-offset async copies
        # crash the TPU worker (even 8-row-aligned), so an HBM-resident
        # state has no working access path — beyond VMEM capacity use
        # the XLA wavefront; (b) dynamic-row loads/stores on a multi-
        # lane-tile memref (Wp > 128, i.e. bw > 63) fail Mosaic with
        # "cannot statically prove that index in dimension 0 is a
        # multiple of 8" — the single-tile Wp=128 form is the validated
        # one, and bw<=63 is also where the chase is cheapest.
        from eigenkernel_tpu.ops.bulge import band_to_tridiag_wavefront2
        return band_to_tridiag_wavefront2(band, bw, mesh=mesh)

    # lane-group sizes: the per-step scoped-VMEM live set is ~10 KB * b
    # per lane (shear temporaries); the 16 MB scoped limit bounds G.
    # Fewer, bigger groups win: the per-group-iteration fixed cost
    # dominates at large n (16384/bw32 A/B: 7 groups 11.25 s vs 4 groups
    # 6.82 s, evidence/CHASE_AB_r3s6.md), so target ~11 MB scoped
    # (G=35 at bw=32; G=34 is hardware-validated, a too-big target
    # fails at COMPILE time, not run time).  Balanced partition with
    # every part >= 2: a size-1 group makes (1, b) vectors, which hit a
    # Mosaic "Invalid relayout" bug (replicated-singleton,
    # hardware-probed).  EK_PALLAS_CHASE_GROUP overrides the target.
    gtarget = int(os.environ.get("EK_PALLAS_CHASE_GROUP", "0")) or \
        max(2, min(nW, 34, (11 * 2 ** 20) // (10240 * b)))
    ngroups = max(1, -(-nW // gtarget))
    if ngroups > 1 and nW // ngroups < 2:
        ngroups = max(1, nW // 2)
    group = tuple(nW // ngroups + (1 if i < nW % ngroups else 0)
                  for i in range(ngroups))

    w = jnp.zeros((rows_tot, Wp), dtype)
    w = lax.dynamic_update_slice(w, _banded_state(band, b, None, W=W),
                                 (pad, 0))

    fuse = int(os.environ.get("EK_PALLAS_CHASE_FUSE", "4"))
    n_steps = -(-tau_max // fuse)
    kern = functools.partial(_chase_kernel, n=n, b=b, W=W, Wp=Wp, T=T,
                             nW=nW, pad=pad, tau_max=tau_max,
                             group=group, span_io=span_io, fuse=fuse,
                             clamp=clamp, align_c=align_c,
                             shear_roll=os.environ.get(
                                 "EK_PALLAS_CHASE_SHEAR", "net") == "roll",
                             dbg=int(os.environ.get(
                                 "EK_PALLAS_CHASE_DBG", "2")))
    state_shape = (rows_tot // 8, 8, Wp) if align_c else (rows_tot, Wp)
    w_in = w.reshape(state_shape)
    pcall = pl.pallas_call(
        kern,
        grid=(n_steps,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, fuse, nW, b + 1), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(state_shape, dtype),
            jax.ShapeDtypeStruct((n_steps, fuse, nW, b + 1), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM(state_shape, dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # raise Mosaic's 16 MB scoped-compute ceiling when the
            # align x big-group composition needs it (the r3 G=34+align
            # compile failure missed it by 284 KB); None = default.
            # NB the knob is in MB (same unit as the state budget above)
            # — passing it raw handed Mosaic a ceiling of N BYTES.
            vmem_limit_bytes=int(os.environ["EK_PALLAS_CHASE_VMEM"]) * 2**20
            if os.environ.get("EK_PALLAS_CHASE_VMEM") else None),
        interpret=interpret,
    )
    # trace the kernel with x64 off: weak Python scalars otherwise
    # canonicalize to int64/float64 under dtype='mixed' and Mosaic's
    # 64-bit convert lowering recurses to RecursionError (r4 sweep);
    # all operands are explicit f32/int32 so this changes nothing else
    with kernel_trace_ctx(dtype):
        wout, vt = pcall(w_in)
    wout = wout.reshape(rows_tot, Wp)
    vt = vt.reshape(n_steps * fuse, nW, b + 1)[:tau_max]

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

    if os.environ.get("EK_CHASE_REPACK", "scatter") == "shear":
        # Gather-free (tau, lane) -> (c, t) repack.  t = (tau%4) + 4j and
        # c = tau//4 - j invert to HV[c, 4j+r] = vt4[c+j, r, j] — a
        # slope-1 shear along the c axis, done with log2(nW) static
        # rolls + per-lane masks (the same trick as the kernel's lane
        # shear) instead of a TPU scatter.  Dead (c, t) slots hold
        # exact zeros because the kernel's live mask zeroes v/tau_h, and
        # the nW zero-pad rows keep the cyclic rolls from wrapping live
        # data into out-of-range slots.
        tm4 = vt.shape[0]
        if tm4 % 4:
            vt = jnp.concatenate(
                [vt, jnp.zeros((4 - tm4 % 4, nW, b + 1), dtype)], axis=0)
        c4 = vt.shape[0] // 4
        x = jnp.concatenate(
            [vt.reshape(c4, 4, nW, b + 1),
             jnp.zeros((nW, 4, nW, b + 1), dtype)], axis=0)
        lane = jnp.arange(nW)[None, None, :, None]
        amt = 1
        while amt < nW:
            x = jnp.where((lane & amt) != 0, jnp.roll(x, -amt, axis=0), x)
            amt *= 2
        y = jnp.transpose(x, (0, 2, 1, 3)).reshape(c4 + nW, 4 * nW, b + 1)
        HV, HT = y[:n, :T, :b], y[:n, :T, b]
    else:
        vs = vt[:, :, :b].reshape(-1, b)
        ths = vt[:, :, b].reshape(-1)
        HV = jnp.zeros((n + 1, T, b), dtype).at[cs, ts, :].set(
            vs, mode="drop")[:n]
        HT = jnp.zeros((n + 1, T), dtype).at[cs, ts].set(
            ths, mode="drop")[:n]
    HV, HT = _shard_chase_store(HV, HT, None)
    return ChaseResult(d=d, e=e, HV=HV, HT=HT,
                       bw=jnp.asarray(bw, jnp.int32))
