"""Pallas TPU kernel: WY-wavefront stage-2 (bulge-chase) back-transform.

``z <- Q2 z`` on the group-wavefront schedule of
:func:`eigenkernel_tpu.ops.bulge.apply_chase_q_wavefront` (group G applies
its WY factor at band position ``t = tau - G``; ordering proof there), but
with the eigenvector block pinned in VMEM:

* the XLA wavefront re-materializes ~4x the covering slice per step in
  HBM (slice copy + multi-pass GEMM re-reads + write), measured 17.8 s at
  n=16384 vs 12.8 s for the blocked loop — both far above the ~0.3 s
  active-window HBM floor.  Here each grid program pins one (rows, TK)
  COLUMN TILE of z in VMEM for ALL ``T + nG - 1`` wavefront steps: z is
  read and written exactly once per tile, and window updates run at VMEM
  bandwidth.
* per step, the reflector anti-diagonal (``wavefront_stores``) and the
  PRECOMPUTED inverse WY factors ``Minv = M^{-1}`` stream in as
  Mosaic-pipelined blocks (static affine index maps — no manual DMAs, so
  none of the dynamic-offset-copy crashes bisected for the chase kernel).
  Streams stay in the lane-dense flat layouts ``(.., nG, g*b)`` /
  ``(.., nG, g*g)`` — a (…, g, b=32) 2-D layout would lane-pad 4x in HBM
  — and are decoded in-kernel with static lane slices + rolls.
* lanes run in a ``fori`` with dynamic-ROW vector loads/stores of their
  (S, TK) window from the VMEM tile (the hardware-validated access
  pattern; S = b + g).  Out-of-range lanes clamp to a shared row past the
  live range: their reflectors are structurally zero, so the
  read-modify-write is an exact identity, and the lane loop is
  sequential, so clamp collisions are harmless.

Constraints (v1): ``128 % b == 0`` and ``g in {32, 64}`` with
``L = b + g - 1 <= 128`` (the decode tiles and the single-lane-tile Y^T);
callers fall back to the XLA wavefront otherwise.

Reference parity: ELPA2's band-to-tridiagonal eigenvector back-transform
(solver_elpa.f90:448 two-stage path); schedule and kernelization are
original TPU designs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from eigenkernel_tpu.ops.bulge import (ChaseResult, _wy_embed,
                                       wavefront_stores)

_TK = 128         # eigenvector columns per grid program
_LCHUNK = 32      # lanes per decode chunk (bounds scoped VMEM)


def _wf_bt_kernel(hv_ref, mi_ref, zin_ref, zout_ref, y_s, m_s, *,
                  n: int, b: int, g: int, nG: int, top: int, dead: int,
                  prec):
    t = pl.program_id(1)
    S = b + g
    dtype = zout_ref.dtype

    @pl.when(t == 0)
    def _init():
        zout_ref[...] = zin_ref[...]

    hvb = hv_ref[0]                              # (nG, g*b)
    mib = mi_ref[0]                              # (nG, g*g)

    # decode the per-lane WY factors into scratch, lane-chunked:
    # y_s rows l*g + j = Y^T row j of lane l (reflector j at lanes
    # [g-1-j, g-1-j+b)); m_s rows l*g + j = Minv row j at lanes [0, g).
    for l0 in range(0, nG, _LCHUNK):
        cs = min(_LCHUNK, nG - l0)
        rows_y = []
        rows_m = []
        for j in range(g):
            ov = j * b
            seg = hvb[l0:l0 + cs, ov:ov + b]
            seg = jnp.pad(seg, ((0, 0), (0, 128 - b)))
            # shift==0 (j==g-1) must skip the roll: Mosaic lowers roll
            # as two slices and rejects the zero-size one
            sh = g - 1 - j
            rows_y.append(jnp.roll(seg, sh, axis=1) if sh else seg)
            om = j * g
            mseg = mib[l0:l0 + cs, om:om + g]
            rows_m.append(jnp.pad(mseg, ((0, 0), (0, 128 - g))))
        y_s[l0 * g:(l0 + cs) * g, :] = jnp.stack(
            rows_y, axis=1).reshape(cs * g, 128)
        m_s[l0 * g:(l0 + cs) * g, :] = jnp.stack(
            rows_m, axis=1).reshape(cs * g, 128)

    nsweeps = n - 2

    def lane(G, carry):
        # no covering slice here, so lanes iterate directly over the
        # store's group axis (sequential; order within one tau is free —
        # same-tau windows are disjoint or identity)
        c0 = nsweeps - 1 - G * g
        row0 = c0 - g + 2 + (t - G) * b + top
        # windows starting past the live z rows have all-zero reflectors
        # (identity) — clamp them to the shared dead row (sequential
        # lane loop => identity read-modify-write is always safe)
        r0 = jnp.where(row0 < top + n, jnp.maximum(row0, 0), dead)
        yt = y_s[pl.ds(G * g, g), :]             # (g, 128); cols [0,S)
        mi = m_s[pl.ds(G * g, g), :]             # (g, 128); cols [0,g)
        zw = zout_ref[pl.ds(r0, S), :]           # (S, TK)
        u = lax.dot_general(yt[:, :S], zw, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec)      # (g, TK)
        v = lax.dot_general(mi[:, :g], u, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec)      # (g, TK)
        upd = lax.dot_general(yt[:, :S], v, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=prec)    # (S, TK)
        zout_ref[pl.ds(r0, S), :] = zw - upd.astype(dtype)
        return carry

    lax.fori_loop(0, nG, lane, 0)


def _minv_stream(hvt: jax.Array, htt: jax.Array, g: int, b: int,
                 tchunk: int = 8) -> jax.Array:
    """Precompute the (Tq, nG, g*g) stream of inverse WY factors
    ``Minv = (tril(Y^T Y, -1) + diag(1/tau))^{-1}`` from the
    tau-major reflector stream, lax.map-chunked over tau so the
    lane-padded (…, g, b) embed transient stays bounded."""
    Tq, nG, _ = hvt.shape
    dtype = hvt.dtype
    L = b + g - 1
    r_arr = jnp.arange(L)
    j_arr = jnp.arange(g)
    emb_q = r_arr[:, None] - (g - 1) + j_arr[None, :]
    emb_ok = (emb_q >= 0) & (emb_q < b)
    eye = jnp.eye(g, dtype=dtype)

    ncn = -(-Tq // tchunk)
    padt = ncn * tchunk - Tq
    hvp = jnp.concatenate(
        [hvt, jnp.zeros((padt, nG, g * b), dtype)], axis=0)
    htp = jnp.concatenate([htt, jnp.ones((padt, nG, g), dtype)], axis=0)

    def chunk(args):
        hv_c, ht_c = args                         # (tc, nG, g*b) / (g,)
        hvr = hv_c.reshape(-1, g, b)
        htr = ht_c.reshape(-1, g)
        Y = jax.vmap(lambda hd: _wy_embed(hd, g, b, L, emb_ok))(hvr)
        gram = jnp.einsum("nlg,nlh->ngh", Y, Y)
        tau_safe = jnp.where(htr == 0, 1.0, htr)
        M = jnp.tril(gram, -1) + eye[None] * (1.0 / tau_safe)[:, :, None]
        minv = lax.linalg.triangular_solve(
            M, jnp.broadcast_to(eye, M.shape), left_side=True, lower=True)
        return minv.reshape(tchunk, nG, g * g)

    out = lax.map(chunk, (hvp.reshape(ncn, tchunk, nG, g * b),
                          htp.reshape(ncn, tchunk, nG, g)))
    return out.reshape(ncn * tchunk, nG, g * g)[:Tq]


def apply_chase_q_wavefront_pallas(res: ChaseResult, z: jax.Array,
                                   bw: int, group: int = 0,
                                   interpret: bool = False) -> jax.Array:
    """``z <- Q2 z`` with the VMEM-tile wavefront kernel (see module
    docstring).  Falls back to the XLA wavefront when the shape is
    outside the kernel's validated envelope."""
    import os

    n, k = z.shape
    b = bw
    T = res.HV.shape[1]
    nsweeps = n - 2
    g = group or int(os.environ.get("EK_BT_GROUP", "0")) or 64
    g = min(g, nsweeps)
    nG = -(-nsweeps // g) if g else 0
    S = b + g
    isz = jnp.dtype(z.dtype).itemsize
    # VMEM footprint of one grid program: two (nG*g, 128) decode
    # scratches + in/out (rows_frame, _TK) z blocks + the streamed
    # hv/mi blocks; reject before compile rather than fault (the
    # Mosaic error would not fall back).
    rows_est = n + 2 * (g + 8) + S + 16
    vmem_bytes = (2 * nG * g * 128 + 2 * rows_est * _TK
                  + 2 * nG * (g * b + g * g)) * isz
    # v5e VMEM is 128 MB; leave headroom for Mosaic pipelining temps.
    # The kernel raises the compiler's scoped-vmem ceiling to this
    # budget (the default 16 MB rejects the z column tile at n>=8192).
    vmem_budget = int(os.environ.get("EK_WF_BT_VMEM", str(100 * 2 ** 20)))
    if (n <= 2 or bw < 2 or res.HV.shape[0] < n or 128 % b != 0
            or g not in (32, 64) or b + g - 1 > 128
            or vmem_bytes > vmem_budget):
        from eigenkernel_tpu.ops.bulge import apply_chase_q_wavefront
        return apply_chase_q_wavefront(res, z, bw, group=group)
    Tp = T + nG
    dtype = z.dtype

    HVv, HTv = wavefront_stores(res, n, b, g)
    hvt = HVv.swapaxes(0, 1)                     # (Tp-1, nG, g*b)
    htt = HTv.swapaxes(0, 1)
    mit = _minv_stream(hvt, htt, g, b)           # (Tp-1, nG, g*g)

    top = g + 8
    dead = top + n + 8
    rows_frame = dead + S + 8
    kp = -(-k // _TK) * _TK
    zp = jnp.zeros((rows_frame, kp), dtype)
    zp = lax.dynamic_update_slice(zp, z, (top, 0))

    kern = functools.partial(_wf_bt_kernel, n=n, b=b, g=g, nG=nG,
                             top=top, dead=dead,
                             prec=lax.Precision.HIGHEST)
    out = pl.pallas_call(
        kern,
        grid=(kp // _TK, Tp - 1),
        in_specs=[
            pl.BlockSpec((1, nG, g * b), lambda c, t: (t, 0, 0)),
            pl.BlockSpec((1, nG, g * g), lambda c, t: (t, 0, 0)),
            pl.BlockSpec((rows_frame, _TK), lambda c, t: (0, c)),
        ],
        out_specs=pl.BlockSpec((rows_frame, _TK), lambda c, t: (0, c)),
        out_shape=jax.ShapeDtypeStruct((rows_frame, kp), dtype),
        scratch_shapes=[
            pltpu.VMEM((nG * g, 128), dtype),
            pltpu.VMEM((nG * g, 128), dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=vmem_budget),
        interpret=interpret,
    )(hvt, mit, zp)
    return out[top:top + n, :k]
