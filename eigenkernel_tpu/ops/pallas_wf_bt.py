"""Pallas TPU kernel: WY-wavefront stage-2 (bulge-chase) back-transform.

``z <- Q2 z`` on the group-wavefront schedule of
:func:`eigenkernel_tpu.ops.bulge.apply_chase_q_wavefront` (group G applies
its WY factor at band position ``t = tau - G``; ordering proof there), but
with the eigenvector block pinned in VMEM:

* the XLA wavefront re-materializes ~4x the covering slice per step in
  HBM (slice copy + multi-pass GEMM re-reads + write), measured 17.8 s at
  n=16384/g=32 vs 12.8 s for the blocked loop — both far above the
  active-window HBM floor.  Here each grid program pins one
  (rows, TK) COLUMN TILE of z in VMEM for ALL wavefront steps: z is read
  and written exactly once per tile (and phase), and window updates run
  at VMEM bandwidth.

* v1 streamed packed (Y, Minv) WY factors and decoded them in-kernel —
  decode-bound (evidence/WF_BT_r4.md).  v2 hoisted the decode: XLA
  precomputes explicit (S, S) window transforms ``P = I - Y Minv Y^T``
  (S = b + g) and the kernel applies ONE MXU GEMM per window.  Hardware:
  1.9 s at n=8192/g=64 — but the per-lane fixed cost (~0.5-0.7 us:
  dynamic-offset VMEM load/store + MXU fill per small GEMM) still
  dominates the ~0.15 s flop floor, and 25-50 % of lane iterations are
  DEAD ramp lanes executing identity GEMMs.

* v3 (this file) COMPOSES ``m`` consecutive band positions of each
  group into one explicit transform

      Q[i, G] = E_{m-1} ... E_1 E_0,   E_j = embed(P_{t=m*i+j}, j*b)

  acting on ``S2 = g + m*b`` rows.  At (g=64, b=32, m=2): S2 = 128 —
  full-MXU-tile (128,128)@(128,TK) GEMMs, HALF the lane iterations, and
  0.67x the flops of v2's 128-col-padded (96,128) windows.  The kernel
  also bounds the lane loop to the LIVE range [max(0, u-Tm+1),
  min(nG-1, u)] — the dead wavefront ramp (33 % of (tau, lane) pairs at
  n=16384/g=64, 50 % after m=2 composition) costs nothing.

  Exactness of the composite schedule (group G runs composite index
  ``i = u - G`` at composite time u): same-u windows are ADJACENT
  disjoint (lane stride = S2 = window length); for any cross-composite
  sub-window pair applied out of original tau order (later composite
  holding the LOWER tau), the original windows sit ``delta*b + k*S``
  rows apart (delta = tau gap >= 0, k = lane gap >= 1), which is >= S >
  window length — they can NEVER overlap, so every overlapping pair
  keeps its original wavefront order, which is exact (proof in
  apply_chase_q_wavefront).  Holds for any m >= 1 (m = 1 is v2).

* reflector access: the composite anti-diagonal ``X[G, m*(u-G)+j]`` of
  the group-major (nG, T, g*b) store is a STATIC flat-stride view after
  zero-padding t to ``m*(U+1)``: flat row ``m*(G*U + u) + j`` — a
  (nG*(U+1), m, blk) reshape indexed [:, j], no gather.  Dead (u, G)
  entries alias other groups' data (garbage), which is safe because the
  live-bounded lane loop never touches them.

* lane windows are 8-row ALIGNED by construction: ``row0 =
  (nsweeps+1-g) - G*(g+m*b) + m*b*u + top`` with ``8 | g`` and
  ``8 | m*b`` — choosing ``top`` zeroes the residue (``pl.multiple_of``
  makes it provable to Mosaic, unlocking multi-lane-tile TK blocks).
  The load takes S2c = roundup(S2, 128) rows (P columns past S2 are
  zero, so the extra rows contribute nothing); the store writes back S2
  rows.

Constraints: ``8 | b``, ``8 | g``, ``b + g <= 128``, ``S2 <= 256``.
The Q stream is built and consumed in composite-tau PHASES of
<= EK_WF_BT_STREAM bytes each; each extra phase costs only one n*k z
re-read.  EK_WF_BT_M overrides the composition depth (auto: largest m
with S2 <= 128); EK_WF_BT_LIVE=0 falls back to the full-range lane loop
with liveness-clamped offsets (identical results).

Reference parity: ELPA2's band-to-tridiagonal eigenvector back-transform
(solver_elpa.f90:448 two-stage path); schedule and kernelization are
original TPU designs.
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

from eigenkernel_tpu.ops.bulge import ChaseResult, _wy_embed, group_stores


def _wf_bt_kernel(toff_ref, p_ref, zin_ref, zout_ref, *,
                  n: int, b: int, g: int, m: int, nG: int, Tm: int,
                  top: int, dead: int, s2c: int, live: bool, prec):
    tl = pl.program_id(1)
    # u is a runtime SMEM scalar offset so every tau-range phase shares
    # ONE compiled program (a static offset would recompile per phase)
    u = tl + toff_ref[0]
    S2 = g + m * b
    dtype = zout_ref.dtype

    @pl.when(tl == 0)
    def _init():
        zout_ref[...] = zin_ref[...]

    nsweeps = n - 2

    def lane(G, carry):
        row0 = (nsweeps + 1 - g) - G * (g + m * b) + m * b * u + top
        if live:
            r0 = row0
        else:
            # full-range loop: dead lanes' stream rows are garbage (the
            # flat-stride view aliases other groups), so clamp them to
            # the shared dead row by LIVENESS — and ALSO by row value:
            # tail-dead windows (zero reflectors ⇒ P = I, row0 up to
            # ~2n) would otherwise load/store past the z frame (Mosaic
            # dynamic row offsets are not bounds-checked on hardware)
            ok = jnp.logical_and(jnp.logical_and(u >= G, u - G < Tm),
                                 row0 < top + n)
            r0 = jnp.where(ok, jnp.maximum(row0, 0), dead)
        r0 = pl.multiple_of(r0, 8)
        pg = p_ref[0, pl.ds(G * S2, S2), :]      # (S2, s2c); cols>=S2 zero
        zw = zout_ref[pl.ds(r0, s2c), :]         # (s2c, TK)
        upd = lax.dot_general(pg, zw, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=prec)    # (S2, TK)
        zout_ref[pl.ds(r0, S2), :] = upd.astype(dtype)
        return carry

    if live:
        S2 = g + m * b
        glo = jnp.maximum(0, u - (Tm - 1))
        # per-sweep tail deadness: a window starting at or past the live
        # z rows has all-zero reflectors (the (sweep, t) store is dense-
        # packed per sweep; short late sweeps zero-pad their tail), i.e.
        # P = I — row0 < top + n  <=>  G > (m*b*u + K - n)/S2, which
        # excludes ANOTHER ~half of the executed lane GEMMs on top of
        # the wavefront-ramp bound.
        K = nsweeps + 1 - g
        # floor division (the numerator goes negative early in the
        # wavefront, where every lane must stay included)
        glo = jnp.maximum(glo,
                          jnp.floor_divide(m * b * u + K - n, S2) + 1)
        ghi = jnp.minimum(nG - 1, u)
        lax.fori_loop(glo, ghi + 1, lane, 0)
    else:
        lax.fori_loop(0, nG, lane, 0)


def _q_stream(hvu: jax.Array, htu: jax.Array, g: int, b: int, m: int,
              tchunk: int = 8) -> jax.Array:
    """Build the (tc, nG*S2, S2c) stream of composite window transforms
    from the composite-anti-diagonal reflector views ``hvu[u, j, G]``
    ((tc, m, nG, g*b)) and ``htu`` ((tc, m, nG, g)).

    Per (u, G): P_j = I - Y_j Minv_j Y_j^T for each sub-position j, then
    Q = E_{m-1} ... E_0 with E_j = embed(P_j at offset j*b) — composed
    incrementally so only S rows of Q are rewritten per j.  Zero
    reflectors (tau = 0) give P = I exactly, so t-padding and partial
    groups compose to exact identities.  lax.map-chunked over u so the
    embed/compose transients stay bounded.
    """
    tc, _, nG, _ = hvu.shape
    dtype = hvu.dtype
    S = b + g
    S2 = g + m * b
    S2c = -(-S2 // 128) * 128
    r_arr = jnp.arange(S)
    j_arr = jnp.arange(g)
    emb_q = r_arr[:, None] - (g - 1) + j_arr[None, :]
    emb_ok = (emb_q >= 0) & (emb_q < b)
    eye_g = jnp.eye(g, dtype=dtype)
    eye_s2 = jnp.eye(S2, dtype=dtype)

    ncn = -(-tc // tchunk)
    padt = ncn * tchunk - tc
    hvp = jnp.concatenate(
        [hvu, jnp.zeros((padt,) + hvu.shape[1:], dtype)], axis=0)
    htp = jnp.concatenate(
        [htu, jnp.zeros((padt,) + htu.shape[1:], dtype)], axis=0)

    def _p_of(hv_j, ht_j):                       # (B, g*b), (B, g) -> P
        hvr = hv_j.reshape(-1, g, b)
        Y = jax.vmap(lambda hd: _wy_embed(hd, g, b, S, emb_ok))(hvr)
        gram = jnp.einsum("nlg,nlh->ngh", Y, Y)
        tau_safe = jnp.where(ht_j == 0, 1.0, ht_j)
        M = jnp.tril(gram, -1) + \
            eye_g[None] * (1.0 / tau_safe)[:, :, None]
        minv = lax.linalg.triangular_solve(
            M, jnp.broadcast_to(eye_g, M.shape),
            left_side=True, lower=True)
        return jnp.einsum("nlg,ngh,nmh->nlm", Y, minv, Y)  # I - P

    def chunk(args):
        hv_c, ht_c = args            # (tch, m, nG, g*b) / (.., g)
        B = hv_c.shape[0] * nG
        with jax.default_matmul_precision("highest"):
            p0 = _p_of(hv_c[:, 0].reshape(B, g * b),
                       ht_c[:, 0].reshape(B, g))
            Q = jnp.broadcast_to(eye_s2, (B, S2, S2)) - \
                jnp.pad(p0, ((0, 0), (0, S2 - S), (0, S2 - S)))
            for j in range(1, m):
                pj = _p_of(hv_c[:, j].reshape(B, g * b),
                           ht_c[:, j].reshape(B, g))
                rows = lax.slice_in_dim(Q, j * b, j * b + S, axis=1)
                rows = rows - jnp.einsum("nlk,nkm->nlm", pj, rows)
                Q = lax.dynamic_update_slice_in_dim(Q, rows, j * b,
                                                    axis=1)
        Q = jnp.pad(Q, ((0, 0), (0, 0), (0, S2c - S2)))
        return Q.reshape(-1, nG * S2, S2c)

    out = lax.map(chunk, (hvp.reshape(ncn, tchunk, m, nG, g * b),
                          htp.reshape(ncn, tchunk, m, nG, g)))
    return out.reshape(ncn * tchunk, nG * S2, S2c)[:tc]


def _composite_views(X: jax.Array, Xt: jax.Array, m: int, U: int):
    """Composite-anti-diagonal views of the group-major stores.

    Returns ``(hvu, htu)`` with ``hvu[u, j, G] = X[G, m*(u-G)+j]``
    (shape (U, m, nG, g*b)) — zero when the band position falls in the
    t-padding, GARBAGE (aliased neighbor data) when ``u < G`` or
    ``u - G >= U`` (dead lanes; never read by the live-bounded kernel).
    Pure reshape/transpose — no gather.
    """
    nG, T, blk = X.shape
    gg = Xt.shape[2]
    Tp = m * (U + 1)
    dtype = X.dtype
    Xp = jnp.concatenate(
        [X, jnp.zeros((nG, Tp - T, blk), dtype)], axis=1)
    Xtp = jnp.concatenate(
        [Xt, jnp.zeros((nG, Tp - T, gg), dtype)], axis=1)
    # flat row m*(G*U + u) + j  ==  X[G, m*(u-G)+j]
    hv = Xp.reshape(nG * (U + 1), m, blk)[: nG * U]
    ht = Xtp.reshape(nG * (U + 1), m, gg)[: nG * U]
    hvu = hv.reshape(nG, U, m, blk).transpose(1, 2, 0, 3)
    htu = ht.reshape(nG, U, m, gg).transpose(1, 2, 0, 3)
    return hvu, htu


def apply_chase_q_wavefront_pallas(res: ChaseResult, z: jax.Array,
                                   bw: int, group: int = 0,
                                   interpret: bool = False) -> jax.Array:
    """``z <- Q2 z`` with the VMEM-tile composite-wavefront kernel (see
    module docstring).  Falls back to the XLA wavefront when the shape
    is outside the kernel's validated envelope or the Q stream exceeds
    its phase budget."""
    n, k = z.shape
    b = bw
    T = res.HV.shape[1]
    nsweeps = n - 2
    g = group or int(os.environ.get("EK_BT_GROUP", "0")) or 64
    g = min(g, nsweeps)
    nG = -(-nsweeps // g) if g else 0
    S = b + g
    isz = jnp.dtype(z.dtype).itemsize

    m = int(os.environ.get("EK_WF_BT_M", "0")) or \
        max(1, (128 - S) // b + 1)
    m = max(1, min(m, T))
    S2 = g + m * b
    S2c = -(-S2 // 128) * 128
    Tm = -(-T // m)
    Tq2 = Tm + nG - 1
    stream_bytes = Tq2 * nG * S2 * S2c * isz
    # the Q stream does not fit HBM whole at n=16384 (8.6 GB at
    # g=64/m=2): build and consume it in <= EK_WF_BT_PHASES composite-
    # tau phases of <= EK_WF_BT_STREAM bytes each (z re-reads cost only
    # n*k*4 bytes per extra phase — negligible next to the stream)
    stream_budget = int(os.environ.get("EK_WF_BT_STREAM",
                                       str(int(2.2 * 2 ** 30))))
    max_phases = int(os.environ.get("EK_WF_BT_PHASES", "8"))
    nph = max(1, -(-stream_bytes // stream_budget))
    if (n <= 2 or bw < 2 or res.HV.shape[0] < n or b % 8 != 0
            or g % 8 != 0 or g < 8 or S > 128 or S2 > 256
            or nph > max_phases):
        from eigenkernel_tpu.ops.bulge import apply_chase_q_wavefront
        return apply_chase_q_wavefront(res, z, bw, group=group)
    dtype = z.dtype

    # frame layout: top margin aligns every window offset to 8 rows
    # (see module docstring); the dead row sits past the live range and
    # the frame leaves S2c loadable rows below every live offset (the
    # last composite's t-padding slides windows up to m*b rows past the
    # original chase range).
    top = g + 8
    top += (-(top + nsweeps + 1 - g)) % 8
    dead = -(-(top + n + m * b + 8) // 8) * 8
    rows_frame = dead + S2c
    # 110 MB hardware-validated at n=16384 (r4e wfv3_16384_vmem: tk=256
    # compiles and runs, 2.586 s warm vs 3.409 s at the old 100 MB/tk=128)
    vmem_budget = int(os.environ.get("EK_WF_BT_VMEM", str(110 * 2 ** 20)))
    tk = int(os.environ.get("EK_WF_BT_TK", "512"))
    # Mosaic double-buffers every window: 2 levels x (z-in + z-out tiles)
    # + 2 levels x the Q block (verified against the 16k compile report:
    # 2*64.84M z windows + 24M P = 153.9M at tk=512)
    while tk > 128 and (4 * rows_frame * tk + 2 * nG * S2 * S2c) * isz \
            > vmem_budget:
        tk //= 2
    if (4 * rows_frame * tk + 2 * nG * S2 * S2c) * isz > vmem_budget:
        # even tk=128 does not fit (e.g. big-m composites at large nG:
        # the double-buffered Q block alone is 2*nG*S2*S2c*4 bytes) —
        # a Mosaic compile would fail at run time on hardware
        from eigenkernel_tpu.ops.bulge import apply_chase_q_wavefront
        return apply_chase_q_wavefront(res, z, bw, group=group)
    kp = -(-k // tk) * tk
    zp = jnp.zeros((rows_frame, kp), dtype)
    zp = lax.dynamic_update_slice(zp, z, (top, 0))

    # Mosaic only lowers DEFAULT and HIGHEST dot precisions (HIGH raises
    # NotImplementedError at lowering, r4e wfv3_8192_prec_high) — expose
    # just those two; "default" = 1-pass bf16 products, A/B only.
    prec = (lax.Precision.DEFAULT
            if os.environ.get("EK_WF_BT_PREC") == "default"
            else lax.Precision.HIGHEST)
    live = os.environ.get("EK_WF_BT_LIVE", "1") != "0"
    # uniform phase length: all phases share one compiled program (the
    # tau offset is a runtime scalar); dead tail taus are never read by
    # the live-bounded loop (and clamp to the dead row otherwise)
    tc = -(-Tq2 // nph)
    U = nph * tc

    # inline so the group-major store and its padded copy die as soon as
    # the composite views are materialized — keeping X alive through the
    # phase loop cost ~2.2 GB of the 16k HBM peak in eager callers
    hvu, htu = _composite_views(*group_stores(res, n, b, g), m, U)

    kern = functools.partial(_wf_bt_kernel, n=n, b=b, g=g, m=m, nG=nG,
                             Tm=Tm, top=top, dead=dead, s2c=S2c,
                             live=live, prec=prec)
    pcall = pl.pallas_call(
        kern,
        grid=(kp // tk, tc),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nG * S2, S2c), lambda c, t: (t, 0, 0)),
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
        pst = _q_stream(hvu[i * tc:(i + 1) * tc],
                        htu[i * tc:(i + 1) * tc], g, b, m)
        # x64 off for the kernel trace (see pallas_chase.py)
        with kernel_trace_ctx(dtype):
            zp = pcall(jnp.full((1,), i * tc, jnp.int32), pst, zp)
    return zp[top:top + n, :k]
