"""Mixed-precision eigenpair refinement (Ogita-Aishima Newton iteration).

TPU rationale: float64 is software-emulated on TPU cores, so a full f64
pipeline pays a large constant.  Instead the pipeline runs in fast float32
and the eigenpairs are *refined* to f64 accuracy with a few GEMM-dominant
Newton steps — the accelerator equivalent of the reference's reliance on
f64 LAPACK throughout.  One step squares the error (1e-7 -> ~1e-14); two
steps are used by default.

Derivation (standard or B-generalized, V the approximate eigenvector block):

    R = V^T B V (Gram),  S = V^T A V,  lambda_j = S_jj / R_jj
    F = I - R                       (orthonormality defect)
    E_ij = (S_ij + F_ij lambda_j) / (lambda_j - lambda_i)   (i != j)
    E_ii = F_ii / 2
    V <- V (I + E)

which is Newton's method on { V^T B V = I, offdiag(V^T A V) = 0 }
(Ogita & Tanaka's RefSyEv/RefSyGv scheme).  Inside eigenvalue clusters the
rotation component is unconstrained (any orthonormal basis of the cluster
eigenspace is a solution), so for |lambda_i - lambda_j| below a gap
threshold only the symmetric orthonormality part F_ij/2 is applied.

Convergence at larger n oscillates with period 2 — a step whose adaptive
gap threshold unfreezes many pairs applies O(1e-3) rotations whose
second-order orthogonality defect the NEXT step repairs (measured on TPU
v5e at n=2048: resid 1e-4 -> 3.6e-6 -> 3.6e-6 -> 7.5e-10 -> 3.7e-12 ->
4e-14) — so the default is 6 steps, not the textbook 2-3.

All O(n^2 k) work is 3 GEMMs per step, mesh-shardable.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh

from eigenkernel_tpu.ops.blocked import _wsc


def refine_eigenpairs(a: jax.Array, v: jax.Array, b: jax.Array | None = None,
                      steps: int | None = None, mesh: Optional[Mesh] = None,
                      gap_factor: float = 30.0):
    """Refine approximate eigenvectors ``v`` (columns) of ``A [x = lam B x]``
    in the dtype of ``a`` (use f64 inputs to refine f32 results).

    ``steps=None`` (the default) reads the ``EK_REFINE_STEPS`` env knob
    (default 6); an explicit ``steps=0`` disables the Newton iteration and
    runs only the cluster-Jacobi cleanup.

    Returns (values, vectors) with vectors [B-]orthonormal to working
    precision.  ``v`` may be lower precision; it is promoted.
    """
    import os

    if steps is None:
        steps = int(os.environ.get("EK_REFINE_STEPS", "6"))
    dtype = a.dtype
    v = v.astype(dtype)
    if b is not None:
        b = b.astype(dtype)
    k = v.shape[1]
    eye = jnp.eye(k, dtype=dtype)
    lam = None
    tiny_prev = None

    # GEMM path for the residual-forming products.  Hardware-measured
    # (TPU v5e, evidence/REFINE_r3.md + session-6 revalidation): the
    # emulated-f64 matmul path reaches 9.5e-15 at n=2048 (0.45 s) but
    # FAILS the 1e-12 bar at n=4096 (2.7e-8 — the truncated emulated-f64
    # lowering floor compounds with n), while the Ozaki bf16-slice path
    # (ops/ozaki.py, exact MXU products recombined to ~2^-48) passes at
    # both sizes AND is faster (2048: 0.34 s / 1.5e-13; 4096: 1.48 s /
    # 4.8e-13) — so auto selects ozaki on TPU.  On CPU f64 is native.
    gemm_mode = os.environ.get("EK_REFINE_GEMM", "auto")
    if gemm_mode == "auto":
        gemm_mode = "ozaki" if jax.default_backend() == "tpu" else "f64"
    # Large-n regime (auto: n > EK_REFINE_CHUNK_MIN, default 8192): the
    # full-width ozaki splits do not fit HBM (>10 GB/operand pair at
    # n=16384) and the unrolled slice-pair GEMMs inflated the XLA memory
    # plan to 290 GB (r4 chain) — switch to the scan-serialized chunked
    # GEMM.  NOTE: on TPU api.solve routes huge n to refine_stepwise
    # (host-stepped, donated buffers) instead of jitting this whole
    # function; this branch remains for direct library use.
    big = a.shape[0] > int(os.environ.get("EK_REFINE_CHUNK_MIN", "8192"))
    if gemm_mode == "ozaki" and big:
        from eigenkernel_tpu.ops import ozaki

        # 6 steps with a cheap first step (see refine_stepwise — the
        # 2-step "9,9" schedule fails from pipeline-quality starts)
        sched = [int(x) for x in os.environ.get(
            "EK_REFINE_OZAKI_SCHED_BIG", "5,9").split(",")]

        def _residual_mats(v, md=None, s_only=False):
            # transpose_a: V^T-products contract dim 0 of v directly —
            # a materialized v.T costs 2 GB of layout-copied hi/lo
            # planes at n=16384 (see ozaki_matmul_chunked docstring)
            av = _wsc(ozaki.ozaki_matmul_chunked(
                a, v, out_dtype=dtype, max_diag=md), mesh)
            s = _wsc(ozaki.ozaki_matmul_chunked(
                v, av, out_dtype=dtype, max_diag=md, transpose_a=True),
                mesh)
            if s_only:
                return av, v, s, None
            if b is None:
                r = _wsc(ozaki.ozaki_matmul_chunked(
                    v, v, out_dtype=dtype, max_diag=md, transpose_a=True),
                    mesh)
                bv = v
            else:
                bv = _wsc(ozaki.ozaki_matmul_chunked(
                    b, v, out_dtype=dtype, max_diag=md), mesh)
                r = _wsc(ozaki.ozaki_matmul_chunked(
                    v, bv, out_dtype=dtype, max_diag=md, transpose_a=True),
                    mesh)
            return av, bv, s, r
    elif gemm_mode == "ozaki":
        from eigenkernel_tpu.ops import ozaki

        op_a = ozaki.split_slices(a, 1)  # hoisted: A is fixed across steps
        op_b = ozaki.split_slices(b, 1) if b is not None else None
        # per-step truncation of the slice-pair expansion: step k only
        # needs gemm_err ~ err_k^2 (quadratic convergence), so the first
        # steps run a ~3x cheaper expansion.  EK_REFINE_OZAKI_SCHED is a
        # comma list of max_diag per step (last entry repeats).
        sched = [int(x) for x in os.environ.get(
            "EK_REFINE_OZAKI_SCHED", "6,9,11").split(",")]

        def _residual_mats(v, md=None, s_only=False):
            op_v = ozaki.split_slices(v, 0, q=md)
            op_vt = ozaki.transpose_operand(op_v)
            av = _wsc(ozaki.ozaki_matmul(op_a, op_v, out_dtype=dtype,
                                         max_diag=md), mesh)
            s = _wsc(ozaki.ozaki_matmul(op_vt, ozaki.split_slices(av, 0, q=md),
                                        out_dtype=dtype, max_diag=md), mesh)
            if s_only:
                return av, v, s, None
            if op_b is None:
                r = _wsc(ozaki.ozaki_matmul(
                    op_vt, op_v, out_dtype=dtype, max_diag=md), mesh)
                bv = v
            else:
                bv = _wsc(ozaki.ozaki_matmul(op_b, op_v, out_dtype=dtype,
                                             max_diag=md), mesh)
                r = _wsc(ozaki.ozaki_matmul(op_vt,
                                            ozaki.split_slices(bv, 0, q=md),
                                            out_dtype=dtype, max_diag=md),
                         mesh)
            return av, bv, s, r
    else:

        def _residual_mats(v, md=None, s_only=False):
            av = _wsc(a @ v, mesh)
            s = _wsc(v.T @ av, mesh)
            if s_only:
                return av, v, s, None
            bv = _wsc(b @ v, mesh) if b is not None else v
            r = _wsc(v.T @ bv, mesh)
            return av, bv, s, r

    for step_i in range(steps):
        md = None
        if gemm_mode == "ozaki":
            md = sched[min(step_i, len(sched) - 1)]
        av, bv, s, r = _residual_mats(v, md)
        lam = jnp.diagonal(s) / jnp.diagonal(r)
        f = eye - r
        dl = lam[None, :] - lam[:, None]          # lambda_j - lambda_i
        scale = jnp.maximum(jnp.max(lam) - jnp.min(lam),
                            jnp.finfo(dtype).tiny)
        # adaptive cluster threshold: pairs whose gap is below ~the current
        # error level (estimated by the orthonormality defect) count as one
        # eigenspace; everything wider gets the full Newton correction.
        # Pairs with gap below ~sqrt(eps) stay frozen permanently: their
        # in-cluster rotation is noise-limited and re-rotating each step
        # degrades orthonormality (the symmetric F/2 part still applies).
        # CONTRACTION-AWARE form (round-3): the defect d feeds back into
        # the rotation correction as ~(F lam / gap), so a pair only
        # contracts when gap/scale > sqrt(d) — a linear-in-d threshold
        # left marginal pairs in a self-sustaining cycle pinned at orth
        # ~5e-7 at n=4096 (measured stepwise on v5e, evidence/REFINE_r3)
        # while n=2048 happened to have no pairs in the critical band.
        # Frozen pairs are rescued by the adjacent-Jacobi cleanup below.
        err_est = jnp.max(jnp.abs(f))
        eps = jnp.finfo(dtype).eps
        floor = 100.0 * jnp.sqrt(eps)
        tiny = scale * jnp.maximum(jnp.sqrt(gap_factor * err_est), floor)
        # MONOTONE threshold: a step's big rotations spike the
        # orthonormality defect, which would re-freeze the marginal-gap
        # pairs just corrected and lock the iteration into a limit cycle
        # (observed plateau at n=4096: resid stuck at 9.1e-10 for 6 and 8
        # steps alike); never letting the threshold grow breaks the cycle
        if tiny_prev is not None:
            tiny = jnp.minimum(tiny, tiny_prev)
        tiny_prev = tiny
        safe = jnp.abs(dl) > tiny
        e_off = jnp.where(safe, (s + f * lam[None, :]) /
                          jnp.where(safe, dl, 1.0), f * 0.5)
        e = jnp.where(eye == 1, f * 0.5, e_off)
        if gemm_mode == "ozaki":
            # the correction GEMM only needs ~eps32 RELATIVE accuracy:
            # its result is O(err) and is added to v in f64, so an f32
            # MXU GEMM contributes err*1e-7 — below the target
            dv = (v.astype(jnp.float32) @ e.astype(jnp.float32))
            v = _wsc(v + dv.astype(dtype), mesh)
        else:
            v = _wsc(v + v @ e, mesh)
    # Cluster cleanup: Newton freezes rotations inside near-degenerate
    # clusters (anything f32 could not separate).  Since cluster members
    # are adjacent in the sorted spectrum, a few batched adjacent-pair
    # Jacobi passes on the projected matrix S = V^T A V diagonalize every
    # cluster exactly — O(k^2) per pass plus ONE V @ J GEMM.
    _, _, s, _ = _residual_mats(v, s_only=True)  # bv/r unused here
    s, j_rot = _adjacent_jacobi(s, passes=6)
    if gemm_mode == "ozaki" and big:
        v = _wsc(ozaki.ozaki_matmul_chunked(v, j_rot, out_dtype=dtype),
                 mesh)
    elif gemm_mode == "ozaki":
        # j_rot can carry O(1) in-cluster rotations whose application
        # must not round v back to f32 accuracy — full-precision GEMM
        v = _wsc(ozaki.ozaki_matmul(ozaki.split_slices(v, 1),
                                    ozaki.split_slices(j_rot, 0),
                                    out_dtype=dtype), mesh)
    else:
        v = _wsc(v @ j_rot, mesh)
    lam = jnp.diagonal(s)
    if b is not None:
        if gemm_mode == "ozaki" and big:
            bv = _wsc(ozaki.ozaki_matmul_chunked(b, v, out_dtype=dtype),
                      mesh)
        elif gemm_mode == "ozaki":
            bv = _wsc(ozaki.ozaki_matmul(op_b, ozaki.split_slices(v, 0),
                                         out_dtype=dtype), mesh)
        else:
            bv = _wsc(b @ v, mesh)
        lam = lam / jnp.sum(v * bv, axis=0)
    order = jnp.argsort(lam)
    return lam[order], v[:, order]


def use_stepwise(n: int) -> bool:
    """Huge-n routing predicate for :func:`refine_stepwise` (api.solve
    calls it OUTSIDE the jit — a host-level step loop cannot run under
    one).  True on TPU above EK_REFINE_CHUNK_MIN (default 8192) when the
    ozaki GEMM path is selected."""
    import os

    force = os.environ.get("EK_REFINE_STEPWISE")
    if force is not None:
        return force == "1"
    if jax.default_backend() != "tpu":
        return False
    gemm_mode = os.environ.get("EK_REFINE_GEMM", "auto")
    if gemm_mode not in ("auto", "ozaki"):
        return False
    return n > int(os.environ.get("EK_REFINE_CHUNK_MIN", "8192"))


def refine_stepwise(a: jax.Array, v: jax.Array, b: jax.Array | None = None,
                    mesh: Optional[Mesh] = None, gap_factor: float = 30.0):
    """Memory-bounded huge-n refinement: small host-stepped jits with the
    big buffers DONATED and every residual GEMM COLUMN-BLOCKED.

    Two r4 failure modes shape this design (both n = 16384 hardware
    measurements): jitting the whole refinement produced a 74 GB XLA
    memory plan, and even the one-jit-per-step form OOM'd at 21.66 GB of
    HLO temps — the full (n,n) f64 S/R/AV intermediates (2 GB each) plus
    the chunked-GEMM hi/lo/carry accumulators at full (n,n) width (4 GB)
    were all live inside one step.  Here:

    * the residual quantities are formed per COLUMN BLOCK (nc columns,
      EK_REFINE_NC, default 2048): block S/R slabs are computed f64-exact
      (ozaki chunked GEMMs), their diagonals extracted in f64 (masked
      reduce — no TPU gather), and the slabs immediately cast into
      (k,k) float32 S32/F output buffers.  No full-width f64 S, R, or
      AV ever exists — peak live set is a + v + two f32 (k,k) buffers
      + O(n*nc) block temps, ~8.5 GB at n = 16384 (vs >21 GB before);
    * the O(err)-sized correction algebra runs in f32 in a separate jit
      with v/S32/F donated (absolute error err * eps32, far below the
      1e-12 bar; the gap dl is formed from the f64 lam THEN cast);
    * the cluster cleanup is CLUSTER-LIMITED: only the columns inside
      below-threshold spectral runs are projected and Jacobi-rotated
      (O(n*m) with m = cluster mass — the full (k,k) f64 Jacobi OOM'd
      at k=16384 on hardware even after every Newton step fit).
    """
    import os

    # 6 steps, NOT the 2-step schedule the r4c n=160 probe suggested:
    # from a PIPELINE-quality start (resid ~1e-6) on clustered spectra
    # (VCNT400std) the period-2 oscillation needs the full 6 steps
    # (measured: s2 5.6e-9 / s4 7.9e-7(!) / s6 7.9e-13); a cheap md=5
    # first step is as accurate as full depth ("5,9" 9.2e-13).
    steps = int(os.environ.get("EK_REFINE_STEPS", "6"))
    sched = [int(x) for x in os.environ.get(
        "EK_REFINE_OZAKI_SCHED_BIG", "5,9").split(",")]
    # nc=1024 (not 2048): the per-block (k, nc) f32 hi/lo/TwoSum remat
    # temps inside the chunked-GEMM scan dominated the r5 16.86 GB plan
    # (~55 x 128 MB live at peak); halving nc halves every one of them
    nc = min(int(os.environ.get("EK_REFINE_NC", "1024")), v.shape[1])
    dtype = a.dtype
    v = v.astype(dtype)
    if b is not None:
        b = b.astype(dtype)
    from eigenkernel_tpu.obs.mem import memstats
    memstats("refine_stepwise:entry")
    tiny = jnp.asarray(jnp.inf, dtype)
    lam = None
    for step_i in range(steps):
        md = sched[min(step_i, len(sched) - 1)]
        # Equalize per-step memory across the truncation schedule: the
        # chunked-GEMM slice temps scale ~ md * nc, so a step at md=9
        # needs ~1.8x the HBM of the md=5 step at the same nc.  That is
        # exactly how the 16k hardware run died (r5 chain F: step 0
        # [md=5] completed, step 1 [md=9] RESOURCE_EXHAUSTED).  Shrink
        # the column block so md * nc stays at the schedule-head value.
        nc_step = nc if md <= sched[0] else max(
            min(256, nc), (nc * sched[0] // md) // 128 * 128)
        nc_step = min(nc_step, v.shape[1])
        s32, f, lam = _j_sr_blocked(a, v, b, md=md, nc=nc_step, mesh=mesh)
        v, tiny = _j_corr_big(v, s32, f, lam, tiny, nc=nc,
                              gap_factor=gap_factor, mesh=mesh)
        # per-step barrier: without it the host enqueues ALL steps ahead,
        # and every queued step's (k, k) output buffers are allocated at
        # dispatch — ~2 GB x steps of dead-on-arrival HBM that runtime-
        # OOM'd the n=16384 run even though each step's plan fits (r5).
        # One dependent-scalar fetch caps the outstanding set at one step.
        float(tiny)
        memstats(f"refine_stepwise:step{step_i}")
    # Cluster cleanup is only needed for pairs Newton FROZE (|gap| <=
    # tiny).  Detecting that costs one (k,) host fetch; when no adjacent
    # gap is below the final threshold, skip it entirely.  When clusters
    # DO exist, the cleanup is CLUSTER-LIMITED: frozen pairs are
    # contiguous runs in the sorted spectrum, so only the m cluster
    # columns (m << k) are projected, Jacobi-rotated, and written back —
    # the full (k,k) f64 Jacobi (6 passes x 3 rotations of a 2 GB matrix
    # plus transposed copies) RESOURCE_EXHAUSTED at k=16384 on hardware
    # (r5 chain H) even after every earlier stage fit.  Independent
    # clusters are batched into groups of <= EK_REFINE_CLUSTER_CAP
    # columns so one jit never sees more than cap-wide temps.
    # EK_REFINE_CLEANUP=1/0 forces the decision.
    import numpy as np

    force = os.environ.get("EK_REFINE_CLEANUP", "auto")
    lam_h = np.asarray(jax.device_get(lam))
    thr = float(jax.device_get(tiny))
    gap_min = float(np.min(np.diff(np.sort(lam_h)))) if lam_h.size > 1 \
        else float("inf")
    skip = gap_min > thr if force == "auto" else force == "0"
    if not skip:
        # cluster members must be CONTIGUOUS COLUMNS: sort first (lam is
        # the last pre-correction Rayleigh quotient — accurate to ~err,
        # far finer than the cluster threshold)
        order = np.argsort(lam_h)
        if not np.array_equal(order, np.arange(order.size)):
            lam, v = _j_reorder(lam, v, tuple(order.tolist()))
            lam_h = lam_h[order]
        # cap=1024 (not 4096): the cleanup's chunked-Ozaki scan bodies
        # hold ~dozens of (n, m_group) f32 product/TwoSum temps — at
        # m=2049 the r5 chain-I compile demanded 16.94 GB (~12 GB of
        # 128 MB temps).  Every such temp scales with the group width,
        # so a 1024 cap quarters them (~3 GB) at the cost of one extra
        # group compile per ~1024 clustered columns.
        cap = int(os.environ.get("EK_REFINE_CLUSTER_CAP", "1024"))
        for group in _segment_groups(_cluster_segments(lam_h, thr), cap):
            v = _j_cluster_cleanup(a, v, segs=group, mesh=mesh)
    lam = _j_diag_blocked(a, v, b, nc=nc, mesh=mesh)
    order = np.argsort(np.asarray(jax.device_get(lam)))
    if not np.array_equal(order, np.arange(order.size)):
        lam, v = _j_reorder(lam, v, tuple(order.tolist()))
    return lam, v


def _cluster_segments(lam_sorted, thr: float):
    """Maximal runs of adjacent (sorted) eigenvalues with gap <= thr,
    as half-open column ranges [(s0, s1), ...] of length >= 2."""
    import numpy as np

    segs = []
    close = np.diff(lam_sorted) <= thr
    i = 0
    while i < close.size:
        if close[i]:
            j = i
            while j < close.size and close[j]:
                j += 1
            segs.append((int(i), int(j + 1)))
            i = j
        else:
            i += 1
    return segs


def _segment_groups(segs, cap: int):
    """Pack independent cluster segments into groups of total width
    <= cap (a single segment wider than cap keeps its own group — a
    cluster cannot be split)."""
    groups, cur, width = [], [], 0
    for s0, s1 in segs:
        w = s1 - s0
        if cur and width + w > cap:
            groups.append(tuple(cur))
            cur, width = [], 0
        cur.append((s0, s1))
        width += w
    if cur:
        groups.append(tuple(cur))
    return groups


@partial(jax.jit, static_argnames=("segs", "mesh"), donate_argnums=(1,))
def _j_cluster_cleanup(a, v, segs, mesh):
    """Diagonalize the projected matrix of the cluster columns in
    ``segs`` and rotate those columns of ``v`` in place.

    The projected S_cl = V_cl^T A V_cl is formed f64-exact (Ozaki
    chunked GEMMs); cross-segment entries are masked to zero so the
    adjacent-Jacobi rotation is EXACTLY block-diagonal per cluster (the
    masked pairs get apq = 0 -> identity rotation).  Temps are O(n*m +
    m^2) with m = total cluster width — independent of k."""
    from eigenkernel_tpu.ops import ozaki

    dtype = a.dtype
    n = v.shape[0]
    vcl = jnp.concatenate(
        [lax.slice(v, (0, s0), (n, s1)) for s0, s1 in segs], axis=1)
    avcl = ozaki.ozaki_matmul_chunked(a, vcl, out_dtype=dtype)
    s_cl = ozaki.ozaki_matmul_chunked(vcl, avcl, out_dtype=dtype,
                                      transpose_a=True)
    seg_id = jnp.concatenate(
        [jnp.full((s1 - s0,), i, jnp.int32)
         for i, (s0, s1) in enumerate(segs)])
    s_cl = jnp.where(seg_id[:, None] == seg_id[None, :], s_cl, 0.0)
    _, j_rot = _adjacent_jacobi(s_cl, passes=6)
    # full-precision apply: j_rot carries O(1) in-cluster rotations
    vnew = ozaki.ozaki_matmul_chunked(vcl, j_rot, out_dtype=dtype)
    off = 0
    for s0, s1 in segs:
        w = s1 - s0
        v = lax.dynamic_update_slice(
            v, lax.slice(vnew, (0, off), (n, off + w)), (0, s0))
        off += w
    return _wsc(v, mesh)


def _diag_mask(k: int, nc: int, j0, dtype):
    """(k, nc) one-hot of the diagonal of column block ``j0:j0+nc``."""
    rows = lax.broadcasted_iota(jnp.int32, (k, nc), 0)
    cols = lax.broadcasted_iota(jnp.int32, (k, nc), 1)
    return (rows == j0 + cols).astype(dtype)


@partial(jax.jit, static_argnames=("md", "nc", "mesh"))
def _j_sr_blocked(a, v, b, md, nc, mesh):
    """Column-blocked residual formation: returns (S32, F, lam) with
    S32 = (V^T A V) and F = (I - V^T B V) cast to f32 (k, k) slab by
    slab, lam = diag(S)/diag(R) in f64.  Only O(n*nc) f64 temps live."""
    from eigenkernel_tpu.ops import ozaki

    dtype = a.dtype
    n, k = v.shape
    nb = -(-k // nc)
    f32 = jnp.float32

    def body(jb, carry):
        s32, f, ds, dr = carry
        j0 = jnp.minimum(jb * nc, k - nc)  # last block overlaps, not pads
        vb = lax.dynamic_slice(v, (0, j0), (n, nc))
        avb = ozaki.ozaki_matmul_chunked(a, vb, out_dtype=dtype,
                                         max_diag=md)
        # transpose_a contracts dim 0 of v in place of a materialized
        # v.T (2 GB of transposed hi/lo copies at n=16384 — OOM item)
        sb = ozaki.ozaki_matmul_chunked(v, avb, out_dtype=dtype,
                                        max_diag=md, transpose_a=True)
        if b is None:
            rb = ozaki.ozaki_matmul_chunked(v, vb, out_dtype=dtype,
                                            max_diag=md, transpose_a=True)
        else:
            bvb = ozaki.ozaki_matmul_chunked(b, vb, out_dtype=dtype,
                                             max_diag=md)
            rb = ozaki.ozaki_matmul_chunked(v, bvb, out_dtype=dtype,
                                            max_diag=md, transpose_a=True)
        dm = _diag_mask(k, nc, j0, dtype)
        ds = lax.dynamic_update_slice(ds, jnp.sum(sb * dm, axis=0), (j0,))
        dr = lax.dynamic_update_slice(dr, jnp.sum(rb * dm, axis=0), (j0,))
        # F = I - R formed in f64 (diagonal = small difference of O(1)
        # values), THEN cast: f32 keeps 1e-7 RELATIVE accuracy of the
        # O(err)-sized entries — absolute err*eps32, below the 1e-12 bar
        s32 = lax.dynamic_update_slice(s32, sb.astype(f32), (0, j0))
        f = lax.dynamic_update_slice(f, (dm - rb).astype(f32), (0, j0))
        return s32, f, ds, dr

    s32, f, ds, dr = lax.fori_loop(
        0, nb, body, (jnp.zeros((k, k), f32), jnp.zeros((k, k), f32),
                      jnp.zeros((k,), dtype), jnp.zeros((k,), dtype)))
    return _wsc(s32, mesh), _wsc(f, mesh), ds / dr


@partial(jax.jit, static_argnames=("nc", "gap_factor", "mesh"),
         donate_argnums=(0,))
def _j_corr_big(v, s32, f, lam, tiny_prev, nc, gap_factor, mesh):
    """Column-blocked Newton correction: the (k, k) f32 intermediates
    (dl, safe, e) never exist full-width — each fori step forms an
    (k, nc) slab of E and its dV columns.  dV is accumulated into ONE
    (n, k) f32 buffer (overlap-tolerant overwrite, matching
    _j_sr_blocked's last-block-overlaps convention) and applied once."""
    dtype = v.dtype
    n, k = v.shape
    f32 = jnp.float32
    lam32 = lam.astype(f32)
    scale = jnp.maximum(jnp.max(lam) - jnp.min(lam), jnp.finfo(dtype).tiny)
    err_est = jnp.max(jnp.abs(f)).astype(dtype)
    floor = 100.0 * jnp.sqrt(jnp.finfo(dtype).eps)
    tiny = scale * jnp.maximum(jnp.sqrt(gap_factor * err_est), floor)
    tiny = jnp.minimum(tiny, tiny_prev)  # monotone (see refine_eigenpairs)
    tiny32 = tiny.astype(f32)
    v32 = v.astype(f32)  # lhs of every block GEMM: the PRE-update v
    nb = -(-k // nc)

    def body(jb, dv_full):
        j0 = jnp.minimum(jb * nc, k - nc)
        s_b = lax.dynamic_slice(s32, (0, j0), (k, nc))
        f_b = lax.dynamic_slice(f, (0, j0), (k, nc))
        lam_b = lax.dynamic_slice(lam, (j0,), (nc,))
        # the GAP must be formed in f64 then cast (not from f32-rounded
        # lam): eps32*|lam| noise corrupts/flips near-cluster gaps
        dl_b = (lam_b[None, :] - lam[:, None]).astype(f32)
        rows = lax.broadcasted_iota(jnp.int32, (k, nc), 0)
        cols = lax.broadcasted_iota(jnp.int32, (k, nc), 1)
        diag_b = rows == (j0 + cols)
        safe = jnp.abs(dl_b) > tiny32
        e_off = jnp.where(safe, (s_b + f_b * lam_b.astype(f32)[None, :]) /
                          jnp.where(safe, dl_b, 1.0), f_b * 0.5)
        e_b = jnp.where(diag_b, f_b * 0.5, e_off)
        return lax.dynamic_update_slice(dv_full, v32 @ e_b, (0, j0))

    dv_full = lax.fori_loop(0, nb, body, jnp.zeros((n, k), f32))
    v = _wsc(v + dv_full.astype(dtype), mesh)
    return v, tiny


@partial(jax.jit, static_argnames=("nc", "mesh"))
def _j_diag_blocked(a, v, b, nc, mesh):
    """Rayleigh quotients only: lam_j = (v_j^T A v_j) / (v_j^T B v_j),
    column-blocked — no (k, k) slab is ever formed.  Used by the
    cleanup-skip path of refine_stepwise (separated spectra) where only
    the final eigenvalues of the refined V are still needed."""
    from eigenkernel_tpu.ops import ozaki

    dtype = a.dtype
    n, k = v.shape
    nb = -(-k // nc)

    def body(jb, carry):
        ds, dr = carry
        j0 = jnp.minimum(jb * nc, k - nc)
        vb = lax.dynamic_slice(v, (0, j0), (n, nc))
        avb = ozaki.ozaki_matmul_chunked(a, vb, out_dtype=dtype)
        bvb = vb if b is None else ozaki.ozaki_matmul_chunked(
            b, vb, out_dtype=dtype)
        ds = lax.dynamic_update_slice(ds, jnp.sum(vb * avb, axis=0), (j0,))
        dr = lax.dynamic_update_slice(dr, jnp.sum(vb * bvb, axis=0), (j0,))
        return ds, dr

    ds, dr = lax.fori_loop(
        0, nb, body, (jnp.zeros((k,), dtype), jnp.zeros((k,), dtype)))
    return _wsc(ds / dr, mesh)


@partial(jax.jit, static_argnames=("order",))
def _j_reorder(lam, v, order):
    idx = jnp.asarray(order)
    return lam[idx], jnp.take(v, idx, axis=1)


def _adjacent_jacobi(s: jax.Array, passes: int = 6):
    """Alternating odd/even batched Jacobi rotations on adjacent index
    pairs of symmetric ``s``; returns (rotated s, accumulated rotation J)
    with ``s_new = J^T s J``.  Angles are ~0 outside clusters (offdiagonals
    there are already ~eps), so this is a targeted cluster diagonalizer."""
    k = s.shape[0]
    dtype = s.dtype
    j_acc = jnp.eye(k, dtype=dtype)
    if k < 2:
        return s, j_acc

    def one_pass(s, j_acc, parity):
        # adjacent pairs (parity, parity+1), (parity+2, parity+3), ...
        # — a REGULAR stride-2 pattern, so every access below is a
        # static slice/reshape view (fancy indexing lowers to TPU
        # gathers/scatters: 34x slow, and the (16384,16384) scatter
        # exceeded the 16 MB scoped-VMEM limit at compile time)
        npair = (k - parity) // 2
        if npair == 0:
            # k==2 parity-1 pass: no adjacent pair starts at index 1;
            # building the slices below with hi < lo would be a trace
            # error, so the pass is the identity.
            return s, j_acc
        lo, hi = parity, parity + 2 * npair
        # diagonals via flat strided views (no gather)
        flat = s.reshape(-1)
        diag = lax.slice(flat, (0,), ((k - 1) * (k + 1) + 1,), (k + 1,))
        sup = lax.slice(flat, (1,), ((k - 2) * (k + 1) + 2,), (k + 1,))
        dpair = lax.slice(diag, (lo,), (hi,)).reshape(npair, 2)
        app = dpair[:, 0]
        aqq = dpair[:, 1]
        apq = lax.slice(sup, (lo,), (hi - 1,), (2,))
        # thresholds/clamps sized for TPU's range-limited emulated f64
        # (double-float: ~f64 precision, f32 EXPONENT range — finfo.tiny
        # flushes to 0 and any overflow, e.g. tau^2, yields NaN rather
        # than inf).  tau clamped to 1e18 keeps tau^2 in range; the
        # resulting t ~ 5e-19 is an exact-enough zero rotation.  The
        # range-limited 1e-30 guard applies only where the range IS
        # limited; elsewhere the relative-scale finfo.tiny guard keeps
        # rotations live even for very small-norm matrices.
        range_limited = (jax.default_backend() == "tpu"
                         and dtype == jnp.float64)
        tiny_thr = 1e-30 if range_limited else float(jnp.finfo(dtype).tiny)
        safe = jnp.abs(apq) > jnp.asarray(tiny_thr, dtype)
        tau = (aqq - app) / jnp.where(safe, 2.0 * apq, 1.0)
        tau = jnp.clip(tau, -1e18, 1e18)
        t = jnp.where(
            safe,
            jnp.where(tau >= 0, 1.0, -1.0) /
            (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau)),
            0.0)
        c = 1.0 / jnp.sqrt(1.0 + t * t)
        sn = t * c

        def rot_rows(m):
            # TPU tiles pad the last TWO dims to (8, 128): a
            # (npair, 2, kk) pair view pads 2->8 sublanes (4x transient)
            # and a (kk, npair, 2) column-pair view pads 2->128 lanes —
            # 64x, 64 GB at k=16384, a compile-time HBM failure.  So:
            # columns rotate as transposed row rotations, and the pair
            # axis runs in lax.map chunks that bound the 4x transient.
            kk = m.shape[1]
            core = m[lo:hi, :]                        # (2*npair, kk)
            step_p = max(1, min(npair, (1 << 21) // max(kk, 1)))
            nch = -(-npair // step_p)
            padp = nch * step_p - npair
            cch = jnp.concatenate([c, jnp.ones((padp,), dtype)]) \
                .reshape(nch, step_p)
            sch = jnp.concatenate([sn, jnp.zeros((padp,), dtype)]) \
                .reshape(nch, step_p)
            if padp:
                core = jnp.concatenate(
                    [core, jnp.zeros((2 * padp, kk), dtype)], axis=0)

            def one(args):
                blk, cj, sj = args
                pair = blk.reshape(step_p, 2, kk)
                mj, mj1 = pair[:, 0, :], pair[:, 1, :]
                new = jnp.stack([cj[:, None] * mj - sj[:, None] * mj1,
                                 sj[:, None] * mj + cj[:, None] * mj1],
                                axis=1)
                return new.reshape(2 * step_p, kk)

            rot = lax.map(one, (core.reshape(nch, 2 * step_p, kk),
                                cch, sch)).reshape(-1, kk)[: 2 * npair]
            return jnp.concatenate([m[:lo, :], rot, m[hi:, :]], axis=0)

        def rot_cols(m):
            return rot_rows(m.T).T

        s = rot_cols(rot_rows(s))
        j_acc = rot_cols(j_acc)
        return s, j_acc

    for i in range(passes):
        s, j_acc = one_pass(s, j_acc, i % 2)
    return s, j_acc
