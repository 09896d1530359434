"""Pallas TPU kernel: WY-wavefront stage-2 (bulge-chase) back-transform.

``z <- Q2 z`` on the group-wavefront schedule of
:func:`eigenkernel_tpu.ops.bulge.apply_chase_q_wavefront` (group G applies
its WY factor at band position ``t = tau - G``; ordering proof there), but
with the eigenvector block pinned in VMEM:

* the XLA wavefront re-materializes ~4x the covering slice per step in
  HBM (slice copy + multi-pass GEMM re-reads + write), measured 17.8 s at
  n=16384/g=32 vs 12.8 s for the blocked loop — both far above the
  active-window HBM floor.  Here each grid program pins one
  (rows, TK<=512) COLUMN TILE of z in VMEM for ALL ``T + nG - 1``
  wavefront steps: z is read and written exactly once per tile, and
  window updates run at VMEM bandwidth.

* v1 of this kernel streamed the packed (Y, Minv) WY factors and decoded
  them in-kernel (rolls + interleaving stacks).  Hardware measurement
  (evidence/WF_BT_r4.md) showed the decode — repeated for every
  (column tile, step) pair — dominates: 3.5 s at n=8192, losing to the
  XLA wavefront (1.55 s).  v2 hoists the decode entirely: XLA
  precomputes the explicit (S, S) window transforms

      P[t, G] = I - Y Minv Y^T          (S = b + g)

  once per solve, stored as a (T+nG-1, nG*S, 128) stream (cols >= S
  zero).  P is the same O(n^2) data volume as the packed WY factors
  (S^2 ~ g*b + g^2 for g ~ 2b) and needs no decoding; each window update
  becomes ONE MXU GEMM ``z_w <- P z_w`` — fewer flops than the 3-GEMM WY
  chain once g >= b.

* lane windows are 8-row ALIGNED by construction: the window offset
  ``r0 = top + c0 - g + 2 + (t-G) b`` is congruent to
  ``top + n - 1 - g (mod 8)`` for every (t, G) when ``8 | b`` and
  ``8 | g`` — choosing ``top`` zeroes the residue, so every dynamic
  row access is (8,128)-tile aligned (``pl.multiple_of`` makes it
  provable to Mosaic, which unlocks multi-lane-tile TK>128 blocks).
  The load takes 128 rows (the P columns past S are zero, so the extra
  rows contribute nothing); the store writes back S rows.

* out-of-range lanes clamp to a shared row past the live range: their
  transform is the identity (zero reflectors => P = I), so the
  read-modify-write is exact, and the lane loop is sequential, so clamp
  collisions are harmless.

Constraints: ``8 | b``, ``8 | g``, ``b + g <= 128``.  The P stream is
built and consumed in tau-range PHASES of <= EK_WF_BT_STREAM bytes each
(n=8192/g=64 fits in one 2.4 GB phase; n=16384 runs 4 phases of its
9.6 GB total — each extra phase costs only one n*k z re-read).  g need
not divide anything: g=96 gives S=128 windows, i.e. full-MXU-tile
(128,128)@(128,TK) GEMMs.

Reference parity: ELPA2's band-to-tridiagonal eigenvector back-transform
(solver_elpa.f90:448 two-stage path); schedule and kernelization are
original TPU designs.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from eigenkernel_tpu.ops.bulge import (ChaseResult, _wy_embed,
                                       wavefront_stores)


def _wf_bt_kernel(toff_ref, p_ref, zin_ref, zout_ref, *,
                  n: int, b: int, g: int, nG: int, top: int, dead: int,
                  prec):
    tl = pl.program_id(1)
    # t_off is a runtime SMEM scalar so every tau-range phase shares ONE
    # compiled program (a static offset would recompile per phase)
    t = tl + toff_ref[0]
    S = b + g
    dtype = zout_ref.dtype

    @pl.when(tl == 0)
    def _init():
        zout_ref[...] = zin_ref[...]

    nsweeps = n - 2

    def lane(G, carry):
        c0 = nsweeps - 1 - G * g
        row0 = c0 - g + 2 + (t - G) * b + top
        # windows starting past the live z rows have all-zero reflectors
        # (P == I) — clamp them to the shared dead row (sequential lane
        # loop => identity read-modify-write is always safe).  Every
        # branch is ==0 mod 8 (see module docstring), so the access is
        # tile-aligned and provably so.
        r0 = jnp.where(row0 < top + n, jnp.maximum(row0, 0), dead)
        r0 = pl.multiple_of(r0, 8)
        pg = p_ref[0, pl.ds(G * S, S), :]        # (S, 128); cols>=S zero
        zw = zout_ref[pl.ds(r0, 128), :]         # (128, TK)
        upd = lax.dot_general(pg, zw, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=prec)    # (S, TK)
        zout_ref[pl.ds(r0, S), :] = upd.astype(dtype)
        return carry

    lax.fori_loop(0, nG, lane, 0)


def _p_stream(hvt: jax.Array, htt: jax.Array, g: int, b: int,
              tchunk: int = 8) -> jax.Array:
    """Precompute the (Tq, nG*S, 128) stream of explicit window
    transforms ``P = I - Y Minv Y^T`` from the tau-major reflector
    stream, lax.map-chunked over tau so the embed/product transients
    stay bounded.  Dead (zero) groups give P = I exactly."""
    Tq, nG, _ = hvt.shape
    dtype = hvt.dtype
    S = b + g
    r_arr = jnp.arange(S)
    j_arr = jnp.arange(g)
    emb_q = r_arr[:, None] - (g - 1) + j_arr[None, :]
    emb_ok = (emb_q >= 0) & (emb_q < b)
    eye_g = jnp.eye(g, dtype=dtype)
    eye_s = jnp.eye(S, dtype=dtype)

    ncn = -(-Tq // tchunk)
    padt = ncn * tchunk - Tq
    hvp = jnp.concatenate(
        [hvt, jnp.zeros((padt, nG, g * b), dtype)], axis=0)
    htp = jnp.concatenate([htt, jnp.ones((padt, nG, g), dtype)], axis=0)

    def chunk(args):
        hv_c, ht_c = args                        # (tc, nG, g*b) / (.., g)
        hvr = hv_c.reshape(-1, g, b)
        htr = ht_c.reshape(-1, g)
        with jax.default_matmul_precision("highest"):
            Y = jax.vmap(lambda hd: _wy_embed(hd, g, b, S, emb_ok))(hvr)
            gram = jnp.einsum("nlg,nlh->ngh", Y, Y)
            tau_safe = jnp.where(htr == 0, 1.0, htr)
            M = jnp.tril(gram, -1) + \
                eye_g[None] * (1.0 / tau_safe)[:, :, None]
            minv = lax.linalg.triangular_solve(
                M, jnp.broadcast_to(eye_g, M.shape),
                left_side=True, lower=True)
            P = eye_s[None] - jnp.einsum("nlg,ngh,nmh->nlm",
                                         Y, minv, Y)
        P = jnp.pad(P, ((0, 0), (0, 0), (0, 128 - S)))
        return P.reshape(tchunk, nG * S, 128)

    out = lax.map(chunk, (hvp.reshape(ncn, tchunk, nG, g * b),
                          htp.reshape(ncn, tchunk, nG, g)))
    return out.reshape(ncn * tchunk, nG * S, 128)[:Tq]


def apply_chase_q_wavefront_pallas(res: ChaseResult, z: jax.Array,
                                   bw: int, group: int = 0,
                                   interpret: bool = False) -> jax.Array:
    """``z <- Q2 z`` with the VMEM-tile wavefront kernel (see module
    docstring).  Falls back to the XLA wavefront when the shape is
    outside the kernel's validated envelope or the P stream exceeds
    its HBM budget."""
    n, k = z.shape
    b = bw
    T = res.HV.shape[1]
    nsweeps = n - 2
    g = group or int(os.environ.get("EK_BT_GROUP", "0")) or 64
    g = min(g, nsweeps)
    nG = -(-nsweeps // g) if g else 0
    S = b + g
    isz = jnp.dtype(z.dtype).itemsize
    Tp = T + nG
    stream_bytes = (Tp - 1) * nG * S * 128 * isz
    # the P stream does not fit HBM whole at n=16384 (9.6 GB at g=64):
    # build and consume it in <= EK_WF_BT_PHASES tau-range phases of
    # <= EK_WF_BT_STREAM bytes each (z re-reads cost only n*k*4 bytes
    # per extra phase — negligible next to the stream itself)
    stream_budget = int(os.environ.get("EK_WF_BT_STREAM",
                                       str(int(3.0 * 2 ** 30))))
    max_phases = int(os.environ.get("EK_WF_BT_PHASES", "8"))
    nph = max(1, -(-stream_bytes // stream_budget))
    if (n <= 2 or bw < 2 or res.HV.shape[0] < n or b % 8 != 0
            or g % 8 != 0 or g < 8 or S > 128 or nph > max_phases):
        from eigenkernel_tpu.ops.bulge import apply_chase_q_wavefront
        return apply_chase_q_wavefront(res, z, bw, group=group)
    dtype = z.dtype

    HVv, HTv = wavefront_stores(res, n, b, g)
    hvt = HVv.swapaxes(0, 1)                     # (Tp-1, nG, g*b)
    htt = HTv.swapaxes(0, 1)

    # frame layout: top margin aligns every window offset to 8 rows
    # (see module docstring); the dead row sits past the live range and
    # the frame leaves 128 loadable rows above every valid offset.
    top = g + 8
    top += (-(top + nsweeps + 1 - g)) % 8
    dead = -(-(top + n + 8) // 8) * 8
    rows_frame = dead + 128
    vmem_budget = int(os.environ.get("EK_WF_BT_VMEM", str(100 * 2 ** 20)))
    tk = int(os.environ.get("EK_WF_BT_TK", "512"))
    # Mosaic double-buffers every window: 2 levels x (z-in + z-out tiles)
    # + 2 levels x the P block (verified against the 16k compile report:
    # 2*64.84M z windows + 24M P = 153.9M at tk=512)
    while tk > 128 and (4 * rows_frame * tk + 2 * nG * S * 128) * isz \
            > vmem_budget:
        tk //= 2
    kp = -(-k // tk) * tk
    zp = jnp.zeros((rows_frame, kp), dtype)
    zp = lax.dynamic_update_slice(zp, z, (top, 0))

    prec = dict(high=lax.Precision.HIGH)[os.environ["EK_WF_BT_PREC"]] \
        if os.environ.get("EK_WF_BT_PREC") else lax.Precision.HIGHEST
    tq = Tp - 1
    # uniform phase length: all phases share one compiled program (the
    # tau offset is a runtime scalar); zero-padded tail taus give dead
    # groups => P = I exactly
    tc = -(-tq // nph)
    if nph * tc > tq:
        hvt = jnp.concatenate(
            [hvt, jnp.zeros((nph * tc - tq,) + hvt.shape[1:], dtype)])
        htt = jnp.concatenate(
            [htt, jnp.zeros((nph * tc - tq,) + htt.shape[1:], dtype)])
    kern = functools.partial(_wf_bt_kernel, n=n, b=b, g=g, nG=nG,
                             top=top, dead=dead, prec=prec)
    pcall = pl.pallas_call(
        kern,
        grid=(kp // tk, tc),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nG * S, 128), lambda c, t: (t, 0, 0)),
            pl.BlockSpec((rows_frame, tk), lambda c, t: (0, c)),
        ],
        out_specs=pl.BlockSpec((rows_frame, tk), lambda c, t: (0, c)),
        out_shape=jax.ShapeDtypeStruct((rows_frame, kp), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=vmem_budget),
        interpret=interpret,
    )
    for i in range(nph):
        pst = _p_stream(hvt[i * tc:(i + 1) * tc],
                        htt[i * tc:(i + 1) * tc], g, b)
        zp = pcall(jnp.full((1,), i * tc, jnp.int32), pst, zp)
    return zp[top:top + n, :k]
