"""Two-stage reduction, stage 2: band -> tridiagonal by bulge chasing.

TPU-native analog of the band-to-tridiagonal kernels inside ELPA2 and
EigenExa's eigen_sx (the second stage the reference delegates to those
libraries; solver_elpa.f90:448, solver_eigenexa.f90:121).

Algorithm (Lang/Schwarz Householder chasing): for each sweep c, a length-bw
Householder (pivot at the band edge) eliminates the sub-band entries of
column c; the two-sided window update creates a triangular bulge one block
down, whose FIRST column is eliminated by the next chase Householder at
p + bw, and whose remaining columns are absorbed by the chases of later
sweeps (each chase eliminates *all* sub-band entries of its target column —
old fill and new fill together).  All updates act on static-size
``bw x (3 bw + 1)`` windows of a padded work matrix, so the whole reduction
is one XLA computation (two nested fori_loops) with O(n^2 bw) flops — no
O(n^3) matvecs.

The chase reflectors are stored per (sweep, position).  Within one sweep
the positions own DISJOINT row windows ``[c+1+t*bw, c+1+(t+1)*bw)``, so
the per-sweep back-transform applies a whole sweep as one batched rank-1
update; the default :func:`apply_chase_q_blocked` goes further and
WY-groups g consecutive sweeps per position (ELPA2's trick), and
:func:`apply_chase_q_blocked_sharded` streams it across a mesh with
column-sharded z and a sweep-sharded reflector store.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh

from eigenkernel_tpu.ops.blocked import _wsc


class ChaseResult(NamedTuple):
    d: jax.Array     # (n,)   tridiagonal diagonal
    e: jax.Array     # (n-1,) subdiagonal
    HV: jax.Array    # (n, T, bw) chase reflectors per (sweep, position)
    HT: jax.Array    # (n, T)     chase taus
    bw: jax.Array    # scalar


def _house_pivot0(x: jax.Array):
    """Householder with pivot at x[0], eliminating x[1:]."""
    dtype = x.dtype
    sigma = jnp.sum(x[1:] * x[1:])
    zero_tail = sigma == 0
    alpha = x[0]
    sgn = jnp.where(alpha >= 0, 1.0, -1.0).astype(dtype)
    beta = jnp.where(zero_tail, alpha, -sgn * jnp.sqrt(alpha * alpha + sigma))
    denom = jnp.where(zero_tail, 1.0, alpha - beta).astype(dtype)
    live = jnp.logical_not(zero_tail).astype(dtype)
    v = jnp.concatenate([live[None], x[1:] / denom * live])
    tau = live * jnp.where(zero_tail, 0.0,
                           (beta - alpha) / jnp.where(beta == 0, 1.0, beta))
    return v.astype(dtype), tau.astype(dtype)


def band_to_tridiag(band: jax.Array, bw: int,
                    schedule: str = "sequential",
                    mesh: Optional[Mesh] = None) -> ChaseResult:
    """Reduce a symmetric band matrix (semibandwidth bw) to tridiagonal.

    ``band`` may be mesh-sharded dense: only the O(n*bw) banded extraction
    crosses the sharded->replicated boundary — the chase itself carries no
    O(n^2) state (see :func:`_to_banded`).

    schedule='wavefront' runs the stagger-4 pipelined variant
    (:func:`band_to_tridiag_wavefront`) — same reflectors, ~8x fewer
    sequential steps.  schedule='wavefront2' is the lean lower-banded
    rewrite of the same schedule (one covering slice per step, half the
    state).  schedule='pallas' runs the same wavefront2 schedule as ONE
    VMEM-resident pallas kernel (ops/pallas_chase.py) — the TPU default
    at scale.
    """
    if schedule == "pallas":
        from eigenkernel_tpu.ops.pallas_chase import band_to_tridiag_pallas

        return band_to_tridiag_pallas(band, bw, mesh=mesh)
    if schedule == "wavefront2":
        return band_to_tridiag_wavefront2(band, bw, mesh=mesh)
    if schedule == "wavefront":
        return band_to_tridiag_wavefront(band, bw, mesh=mesh)
    return _band_to_tridiag_seq(band, bw, mesh=mesh)


def _to_banded(band: jax.Array, b: int, W: Optional[int] = None) -> jax.Array:
    """Extract banded storage from a dense symmetric band matrix.

    Returns wb (n, W) with wb[i, dd] = band[i, i + dd - 2b] — the chase
    windows only ever touch diagonals -2b..2b, so this O(n*b) array is the
    WHOLE chase state (the dense (n+2pad)^2 work matrix of the first
    design replicated O(n^2) per device; this is what lets stage 2 scale).
    W defaults to the full 4b+1 diagonals; W=2b+1 keeps only the LOWER
    half (dd <= 2b), which is all the wavefront2 schedule stores.
    """
    n = band.shape[0]
    off = 2 * b
    if W is None:
        W = 4 * b + 1
    cols = jnp.arange(n)[:, None] + jnp.arange(W)[None, :] - off
    if W > n + 1:
        # tiny matrix relative to the band: the stride-(n+1) view cannot
        # hold all W diagonals — the (small) element gather is fine here
        valid = (cols >= 0) & (cols < n)
        rows = jnp.arange(n)[:, None]
        return jnp.where(valid, band[rows, jnp.clip(cols, 0, n - 1)], 0.0)
    # wb[i, dd] = band[i, i + dd - off] = band.flat[i*(n+1) + dd - off]:
    # uniform stride n+1, so the extraction is one padded reshape (no
    # element gather — the TPU slow path)
    flat = jnp.concatenate([jnp.zeros((off,), band.dtype),
                            band.reshape(-1),
                            jnp.zeros((n + W,), band.dtype)])
    wb = flat[: n * (n + 1)].reshape(n, n + 1)[:, :W]
    # col<0 slots: row 0 reads the zero prefix; rows i>=1 wrap into the
    # PREVIOUS row's trailing entries, which are exact zeros only because
    # ``band`` is exactly banded (to_band masks outside the band) — this
    # precondition is load-bearing.  col>=n slots wrap into the NEXT row's
    # leading entries (live data) and are masked here.
    return jnp.where(cols < n, wb, 0.0)


def _banded_state(band: jax.Array, b: int,
                  mesh: Optional[Mesh],
                  W: Optional[int] = None) -> jax.Array:
    from jax.sharding import PartitionSpec as P

    wbc = _to_banded(band, b, W=W)
    if mesh is not None:
        wbc = _wsc(wbc, mesh, spec=P())     # replicate the O(n*bw) state
    return wbc


def _shard_chase_store(HV: jax.Array, HT: jax.Array,
                       mesh: Optional[Mesh]):
    """Pin the O(n^2) reflector store sharded over the sweep axis so no
    device materializes it whole between pipeline stages."""
    if mesh is None:
        return HV, HT
    from jax.sharding import PartitionSpec as P

    n_dev = 1
    for a in mesh.axis_names:
        n_dev *= mesh.shape[a]
    if HV.shape[0] % n_dev == 0:
        axes = tuple(mesh.axis_names)
    elif HV.shape[0] % mesh.shape[mesh.axis_names[0]] == 0:
        axes = mesh.axis_names[0]
    else:
        return HV, HT
    HV = _wsc(HV, mesh, spec=P(axes, None, None))
    HT = _wsc(HT, mesh, spec=P(axes, None))
    return HV, HT


def _band_to_tridiag_seq(band: jax.Array, bw: int,
                         mesh: Optional[Mesh] = None) -> ChaseResult:
    n = band.shape[0]
    dtype = band.dtype
    b = bw
    if n <= 2 or bw <= 1:
        d = jnp.diag(band)
        e = jnp.diag(band, -1) if n > 1 else jnp.zeros((0,), dtype)
        return ChaseResult(d, e, jnp.zeros((n, 1, b), dtype),
                           jnp.zeros((n, 1), dtype),
                           jnp.asarray(bw, jnp.int32))
    pad = 3 * b + 2
    T = n // b + 2
    W = 4 * b + 1
    off = 2 * b
    wb = jnp.zeros((n + 2 * pad, W), dtype)
    wb = lax.dynamic_update_slice(wb, _banded_state(band, b, mesh), (pad, 0))

    def sweep(wb, c):
        wb, HVc, HTc = _chunk_sweep_body(wb, c, n, b, T, W, off, pad, dtype)
        return wb, (HVc, HTc)

    # scan (not fori) so the O(n^2) reflector store is a per-sweep ys
    # OUTPUT — shardable over the sweep axis — rather than a replicated
    # loop carry
    wb, (HVs, HTs) = lax.scan(sweep, wb, jnp.arange(n - 2))
    HV = jnp.concatenate([HVs, jnp.zeros((2, T, b), dtype)], axis=0)
    HT = jnp.concatenate([HTs, jnp.zeros((2, T), dtype)], axis=0)
    d = wb[pad:pad + n, off]
    e = wb[pad + 1:pad + n, off - 1]
    HV, HT = _shard_chase_store(HV, HT, mesh)
    return ChaseResult(d=d, e=e, HV=HV, HT=HT, bw=jnp.asarray(bw, jnp.int32))


def apply_chase_q(res: ChaseResult, z: jax.Array, bw: int,
                  mesh: Optional[Mesh] = None,
                  transpose: bool = False) -> jax.Array:
    """``z <- Q2 z`` (or ``Q2^T z``) with Q2 the stage-2 chase transform.

    One fori_loop over sweeps (reverse order for Q2); each step applies the
    sweep's disjoint-window reflectors as a single batched rank-1 update.
    """
    n, k = z.shape
    b = bw
    T = res.HV.shape[1]
    if n <= 2 or bw <= 1 or res.HV.shape[0] < n:
        return z
    padz = (T + 2) * b
    zp = jnp.zeros((n + padz, k), z.dtype)
    zp = lax.dynamic_update_slice(zp, z, (0, 0))
    nsweeps = n - 2

    def step(i, zp):
        c = i if transpose else nsweeps - 1 - i
        v = lax.dynamic_slice(res.HV, (c, 0, 0), (1, T, b))[0]   # (T, b)
        tau = lax.dynamic_slice(res.HT, (c, 0), (1, T))[0]       # (T,)
        zwin = lax.dynamic_slice(zp, (c + 1, 0), (T * b, k))
        zwin = zwin.reshape(T, b, k)
        coef = jnp.einsum("tb,tbk->tk", v, zwin) * tau[:, None]
        zwin = zwin - v[:, :, None] * coef[:, None, :]
        zp = lax.dynamic_update_slice(zp, zwin.reshape(T * b, k), (c + 1, 0))
        return zp

    zp = lax.fori_loop(0, nsweeps, step, zp)
    return zp[:n]


def _wy_embed(hv_desc: jax.Array, g: int, b: int, L: int,
              emb_ok: jax.Array) -> jax.Array:
    """Shifted-diagonal embedding Y[r, j] = hv_desc[j, r - (g-1) + j].

    The embedding is a per-column shift with UNIFORM flat stride b+1
    (flat[j*(b+1) + r - (g-1)]), so it is materialized as two shifted
    reshapes + a mask instead of an element gather (the TPU slow path).
    """
    dtype = hv_desc.dtype
    flat = hv_desc.reshape(-1)
    n_pl = -(-L // (b + 1))          # shifted reshape planes (any g)
    fp = jnp.concatenate([jnp.zeros((g - 1,), dtype), flat,
                          jnp.zeros(((n_pl + 1) * (b + 1) + g,), dtype)])
    planes = [fp[p * (b + 1): (p + g) * (b + 1)].reshape(g, b + 1)
              for p in range(n_pl)]
    yt = planes[0] if n_pl == 1 else jnp.concatenate(planes, axis=1)
    yt = yt[:, :L]
    return jnp.where(emb_ok, yt.T, 0.0)


def apply_chase_q_blocked(res: ChaseResult, z: jax.Array, bw: int,
                          group: int = 0,
                          mesh: Optional[Mesh] = None) -> jax.Array:
    """``z <- Q2 z`` with g consecutive sweeps WY-grouped (ELPA2's trick).

    The unblocked path reads the whole trailing z block once per sweep —
    O(n^2 k) memory traffic.  Here ``group`` consecutive sweeps are fused:
    at band position t their reflectors live in a (bw+g-1)-row window,
    shifted one row per sweep.  Processing positions in ASCENDING t order
    (and sweeps newest-first inside a position) preserves the relative
    order of every overlapping reflector pair — adjacent-position overlaps
    (c',t) vs (c,t+1) only exist for c < c' < c+2bw and the original
    schedule applies (c',t) first — so the product is EXACTLY the same Q2.

    Per window the reversed product is applied in compact form

        P = H_{g-1} ... H_0 = I - Y M^{-1} Y^T,
        M = diag(1/tau) + tril(Y^T Y, -1)

    (M^{-1} is the transpose of the LAPACK dlarft T factor of the forward
    product), i.e. one small triangular solve plus two (bw+g-1, k) GEMMs —
    memory traffic drops to ~n^2 k (1/g + 1/bw).
    """
    n, k = z.shape
    b = bw
    T = res.HV.shape[1]
    if n <= 2 or bw <= 1 or res.HV.shape[0] < n:
        return z
    # g > bw would create non-adjacent-position overlaps inside a group,
    # which the ascending-t order does not protect — clamp.  TPU default
    # g=bw: the (g, bw+g-1) WY GEMMs then fill full MXU tiles.
    if group <= 0:
        group = b if jax.default_backend() == "tpu" else 32
    g = min(group, b)
    nsweeps = n - 2
    n_groups = -(-nsweeps // g)
    L = b + g - 1
    dtype = z.dtype

    # pad the sweep axis in FRONT so the oldest group's slice start is
    # always valid (zero reflectors = identity)
    HVp = jnp.concatenate([jnp.zeros((g, T, b), dtype), res.HV[:n]], axis=0)
    HTp = jnp.concatenate([jnp.zeros((g, T), dtype), res.HT[:n]], axis=0)

    top = g + 1
    padz = (T + 2) * b + g
    zp = jnp.zeros((n + top + padz, k), dtype)
    zp = lax.dynamic_update_slice(zp, z, (top, 0))

    r_arr = jnp.arange(L)
    j_arr = jnp.arange(g)
    # embedding validity: Y[r, j] = hv_desc[j, r - (g-1-j)]
    emb_q = r_arr[:, None] - (g - 1) + j_arr[None, :]
    emb_ok = (emb_q >= 0) & (emb_q < b)

    def step(s, zp):
        G = s // T
        t = s % T
        c0 = nsweeps - 1 - G * g
        # sweeps c0-g+1 .. c0 at position t, newest (c0) first
        hv = lax.dynamic_slice(HVp, (c0 + 1, t, 0), (g, 1, b))[:, 0, :]
        ht = lax.dynamic_slice(HTp, (c0 + 1, t), (g, 1))[:, 0]
        hv_desc = hv[::-1]                      # application order j=0 first
        ht_desc = ht[::-1]
        Y = _wy_embed(hv_desc, g, b, L, emb_ok)             # (L, g)
        gram = Y.T @ Y
        tau_safe = jnp.where(ht_desc == 0, 1.0, ht_desc)
        M = jnp.tril(gram, -1) + jnp.diag(1.0 / tau_safe)
        row0 = c0 - g + 2 + t * b + top          # window start in zp
        zw = lax.dynamic_slice(zp, (row0, 0), (L, k))
        w1 = Y.T @ zw
        w2 = jax.scipy.linalg.solve_triangular(M, w1, lower=True)
        zw = zw - Y @ w2
        return lax.dynamic_update_slice(zp, zw, (row0, 0))

    zp = lax.fori_loop(0, n_groups * T, step, zp)
    return zp[top:top + n]


def group_stores(res: ChaseResult, n: int, b: int, g: int):
    """Group-major band-position reflector stores.

    Returns ``(X, Xt)`` with ``X[G, t]`` = the (g*b,)-flat reflector
    block of group ``G`` (sweeps ``[c0-g+1 .. c0]``,
    ``c0 = nsweeps-1-G*g``, NEWEST sweep first — the blocked path's
    hv_desc order) at band position ``t`` in [0, T), and ``Xt[G, t]``
    the matching (g,) taus.  The last (partial) group's missing sweeps
    are zero reflectors with tau = 0 (exact identity).

    Built with ``g*b`` as the MINOR dim throughout: any (…, g, b) or
    (…, T, b) intermediate lane-pads b=32 -> 128 on TPU (4x — multi-GB
    at n=16384), so the per-group transpose runs in a lax.map whose
    (g, T, b) transient is a few MB.
    """
    T = res.HV.shape[1]
    nsweeps = n - 2
    nG = -(-nsweeps // g)
    dtype = res.HV.dtype
    padG = nG * g - nsweeps

    def _build_group(Gi):                     # Gi in [0, nG-2]: no pad
        start = nsweeps - (Gi + 1) * g
        hv = lax.dynamic_slice(res.HV, (start, 0, 0), (g, T, b))[::-1]
        ht = lax.dynamic_slice(res.HT, (start, 0), (g, T))[::-1]
        return (hv.swapaxes(0, 1).reshape(T, g * b), ht.swapaxes(0, 1))

    lastv = jnp.concatenate(
        [jnp.zeros((padG, T, b), dtype), res.HV[: g - padG]], axis=0)[::-1]
    lastt = jnp.concatenate(
        [jnp.zeros((padG, T), dtype), res.HT[: g - padG]], axis=0)[::-1]
    lastv = lastv.swapaxes(0, 1).reshape(1, T, g * b)
    lastt = lastt.swapaxes(0, 1)[None]
    if nG > 1:
        Xm, Xtm = lax.map(_build_group, jnp.arange(nG - 1))
        X = jnp.concatenate([Xm, lastv], axis=0)
        Xt = jnp.concatenate([Xtm, lastt], axis=0)
    else:
        X, Xt = lastv, lastt
    return X, Xt


def wavefront_stores(res: ChaseResult, n: int, b: int, g: int):
    """Anti-diagonal wavefront reflector stores.

    Returns ``(HVv, HTv)`` with ``HVv[G, tau]`` = the (g*b,)-flat
    reflector block of group ``G`` (sweeps ``[c0-g+1 .. c0]``,
    ``c0 = nsweeps-1-G*g``, NEWEST sweep first — the blocked path's
    hv_desc order) at band position ``t = tau - G`` (zeros when t is
    out of [0, T)), and ``HTv[G, tau]`` the matching (g,) taus.

    Built with ``g*b`` as the MINOR dim throughout: any (…, g, b) or
    (…, T, b) intermediate lane-pads b=32 -> 128 on TPU (4x — multi-GB
    at n=16384), so the per-group transpose runs in a lax.map whose
    (g, T, b) transient is a few MB, and no full-size reverse or
    swapaxes of the b-minor store is ever materialized.  The
    anti-diagonal ``X[G, tau-G]`` is the static flat-stride view
    ``flat[G*(Tp-1) + tau]`` of the t-axis-zero-padded store (flat row
    ``G*Tp + t`` holds X[G, t]; out-of-range t reads the padding).
    """
    T = res.HV.shape[1]
    nsweeps = n - 2
    nG = -(-nsweeps // g)
    Tp = T + nG
    dtype = res.HV.dtype
    X, Xt = group_stores(res, n, b, g)
    X = jnp.concatenate([X, jnp.zeros((nG, nG, g * b), dtype)], axis=1)
    Xt = jnp.concatenate([Xt, jnp.zeros((nG, nG, g), dtype)], axis=1)
    HVv = X.reshape(nG * Tp, g * b)[: nG * (Tp - 1)].reshape(
        nG, Tp - 1, g * b)
    HTv = Xt.reshape(nG * Tp, g)[: nG * (Tp - 1)].reshape(
        nG, Tp - 1, g)
    return HVv, HTv


def apply_chase_q_wavefront(res: ChaseResult, z: jax.Array, bw: int,
                            group: int = 0,
                            mesh: Optional[Mesh] = None) -> jax.Array:
    """``z <- Q2 z``: the blocked WY application on a group WAVEFRONT.

    :func:`apply_chase_q_blocked` runs ``n_groups * T`` sequential window
    steps — latency-bound on TPU (~24 us/step fixed cost, measured at
    n=8192: 1.92 s vs a 0.34 s HBM floor).  Here group ``G`` executes its
    band position ``t = tau - G``, so one loop step applies ALL groups'
    windows batched.  This is exact:

    * windows active at the same ``tau`` are row-DISJOINT — lane spacing
      is ``S = b + g`` rows > window length ``L = b + g - 1``;
    * every overlapping pair keeps its blocked-schedule order — for
      ``G' > G`` overlap requires ``|(t'-t)b - (G'-G)g| < L`` which with
      ``g <= b`` forces ``t' - t >= G' - G - 1 >= 0``, hence
      ``tau' - tau = (t'-t) + (G'-G) >= 1`` (and the ``tau' = tau`` case
      is the disjoint same-step batch).

    The active windows at time ``tau`` start at ``base(tau) + l*S`` for
    lane ``l = nG-1-G`` — a REGULAR stride — so one covering dynamic
    slice of ``(nG*S, k)`` rows feeds a batched ``(nG, L, k)`` update
    (the chase kernel's covering-slice trick applied to the BT).  Lanes
    whose ``t`` is out of ``[0, T)`` read all-zero reflectors from the
    store's padding (tau=0 => M=I, Y=0: exact identity).  Sequential
    steps drop to ``T + nG - 1``; loop count at 8192/bw32: 514 vs 66048.

    Reflector access: the per-``tau`` anti-diagonal ``X[G, tau-G]`` of
    the (nG, T', g, b) group-major store is a STATIC flat-stride view
    (``flat[G*(T'-1) + tau]`` with the t axis zero-padded to
    ``T' = T + nG``), sliced per step at dynamic ``tau`` — no gathers.
    """
    n, k = z.shape
    b = bw
    T = res.HV.shape[1]
    if n <= 2 or bw <= 1 or res.HV.shape[0] < n:
        return z
    if group <= 0:
        group = 4 * b if jax.default_backend() == "tpu" else 32
    # UNLIKE the blocked path, g is NOT clamped to b: for any g, (a)
    # same-tau windows stay disjoint (lane stride S = L+1 regardless),
    # and (b) for G' > G every overlapping pair satisfies
    # |dg - sb| < b+g-1 (d=G'-G, s=t'-t) => s + d > (g/b)(d-1) + d - 1
    # + 1/b > 0, i.e. tau' > tau — and between groups the original
    # schedule is G-major (group G's sweeps are all newer), so order is
    # preserved; within a window the WY factor is exact for any overlap
    # pattern.  Bigger g cuts both traffic (~1/g + 1/b per z element)
    # and steps (T + n/g).
    nsweeps = n - 2
    g = min(group, nsweeps)
    nG = -(-nsweeps // g)
    L = b + g - 1
    S = b + g
    Tp = T + nG
    dtype = z.dtype
    HVv, HTv = wavefront_stores(res, n, b, g)

    # z row frame: z[i] at zp row top+i; window (G, t) starts at z row
    # c0-g+2+t*b (as in the blocked path) = base(tau) + l*S - top
    top = max(0, (nG - 1) * S + g - (nsweeps + 1)) + 8
    base0 = nsweeps + 1 + top - g - (nG - 1) * S         # base(tau=0)
    rows_tot = max(base0 + (Tp - 2) * b + nG * S + 8, top + n)

    r_arr = jnp.arange(L)
    j_arr = jnp.arange(g)
    emb_q = r_arr[:, None] - (g - 1) + j_arr[None, :]
    emb_ok = (emb_q >= 0) & (emb_q < b)
    embed = jax.vmap(lambda hd: _wy_embed(hd, g, b, L, emb_ok))
    eye = jnp.eye(g, dtype=dtype)

    eye_s = jnp.eye(S, dtype=dtype)

    def make_step(m):
        eye_m = jnp.broadcast_to(eye, (m, g, g))

        def step(tau, zp):
            # active lanes are [max(0, nG-1-tau), nG-1-max(0, tau-T+1)];
            # anchor an m-lane cover at the (clamped) lower bound —
            # m >= active count by bucket construction.  Lane l holds
            # group G = nG-1-l, so the reflector slice starts at
            # G = nG-l0-m and is flipped (an m-sized transient).
            l0 = jnp.minimum(jnp.maximum(0, nG - 1 - tau), nG - m)
            hv = lax.dynamic_slice(HVv, (nG - l0 - m, tau, 0),
                                   (m, 1, g * b))[::-1].reshape(m, g, b)
            ht = lax.dynamic_slice(HTv, (nG - l0 - m, tau, 0),
                                   (m, 1, g))[::-1][:, 0, :]
            Y = embed(hv)                                     # (m, L, g)
            gram = jnp.einsum("nlg,nlh->ngh", Y, Y)
            tau_safe = jnp.where(ht == 0, 1.0, ht)
            M = jnp.tril(gram, -1) \
                + eye[None] * (1.0 / tau_safe)[:, :, None]
            # invert the small (g, g) factor against I and apply by
            # GEMM: a triangular solve against the (g, k)-wide RHS is
            # sequential substitution on TPU and dominated the step
            # (measured 4.7 s vs 1.9 s blocked at 8192 before this)
            minv = lax.linalg.triangular_solve(M, eye_m, left_side=True,
                                               lower=True)
            # build the full (S, S) window transform P = I - Y Minv Y^T
            # (padded to the cover stride) and apply it as ONE batched
            # GEMM: three (m, L~63, g=32)-shaped einsums against the
            # k-wide cover run the MXU at ~12% tile fill (measured
            # 3.7 s at 8192/bw32); the (S, S) build is O(m L^2 g) —
            # trivial — and the single (m,S,S)@(m,S,k) apply packs
            # 2x2 larger tiles
            ym = jnp.einsum("nlg,ngh->nlh", Y, minv)
            p_ll = jnp.einsum("nlh,nmh->nlm", ym, Y)        # (m, L, L)
            P = eye_s[None] - jnp.pad(
                p_ll, ((0, 0), (0, S - L), (0, S - L)))
            base = base0 + tau * b + l0 * S
            kc_w = zp.shape[1]
            zw = lax.dynamic_slice(zp, (base, 0), (m * S, kc_w)).reshape(
                m, S, kc_w)
            zw = jnp.einsum("nst,ntk->nsk", P, zw)
            return lax.dynamic_update_slice(zp, zw.reshape(m * S, kc_w),
                                            (base, 0))

        return step

    # pow-2 lane buckets: the ramps (few active lanes at early/late tau)
    # run with proportionally small covers instead of the full nG*S rows
    # — active-count traffic is the floor and the full cover pays ~2x it
    # when T ~= nG.  Bucket sizes are static per contiguous tau segment.
    def a_cnt(tau):
        return min(tau + 1, T, nG, Tp - 1 - tau)

    segs = []                     # (tau_start, tau_end, m)
    for tau in range(Tp - 1):
        m = 1 << max(0, (a_cnt(tau) - 1).bit_length())
        m = min(m, nG)
        if segs and segs[-1][2] == m:
            segs[-1][1] = tau + 1
        else:
            segs.append([tau, tau + 1, m])

    def apply_cols(zc):
        zp = jnp.zeros((rows_tot, zc.shape[1]), dtype)
        zp = lax.dynamic_update_slice(zp, zc, (top, 0))
        for t0, t1, m in segs:
            zp = lax.fori_loop(t0, t1, make_step(m), zp)
        return zp[top:top + n]

    # column chunks bound the padded-z (+ cover temporaries) working set
    # to ~1 GB each — needed for HBM headroom at n=16384 full spectrum
    # (the reflector stores above are built ONCE, outside the loop).
    # array_split semantics (at most two distinct widths) so a prime k
    # still chunks instead of collapsing to one full-width pass.
    import os
    kc = int(os.environ.get("EK_BT_KCHUNK", "0")) or \
        max(1, min(k, int(rows_tot * k * z.dtype.itemsize) // 2 ** 30))
    if kc <= 1:
        return apply_cols(z)
    bounds = [k * i // kc for i in range(kc + 1)]
    return jnp.concatenate(
        [apply_cols(z[:, bounds[i]:bounds[i + 1]]) for i in range(kc)],
        axis=1)


def _chunk_sweep_body(wb, c, n, b, T, W, off, pad, dtype):
    """One sweep of the sequential chase on banded storage.

    Parallelogram views of the banded array stand in for the dense
    windows: ``A[p+i, p-b-1+j] = rowblk[i, j-i+b-1]`` and
    ``A[p-b-1+i, p+j] = colblk[i, j-i+3b+1]`` — all indices in [0, 4b].
    The per-row shear ``Y[i, j] = X[i, j - i + s]`` is materialized WITHOUT
    gathers (element gathers are the slow path on TPU) by the flat-stride
    trick: ``X.flat[i*W + j - i + s] = X.flat[i*(W-1) + (j + s)]``, i.e. a
    STATIC slice of the flattened block reshaped to row stride W-1.  Both
    shears here stay in range by construction (indices span [0, 4b] ⊂
    [0, W)), and the un-shear is the same view written back, so the whole
    two-sided update is static slices + reshapes + outer products.
    """
    win = 3 * b + 1

    def chase(t, inner):
        # one (win, W) block slice covers BOTH two-sided windows (rows
        # p..p+b sit at block rows b+1..2b+1): single dynamic slice +
        # single write-back per step
        wb, HVc, HTc = inner
        p = c + 1 + t * b
        jcol = jnp.where(t == 0, c, p - b)
        B = lax.dynamic_slice(wb, (pad + p - b - 1, 0), (win, W))
        rowpart = B[b + 1:2 * b + 1]
        # sheared row view: rflat_view[i, q] = rowpart[i, q - i]
        rflat = rowpart.reshape(-1)
        rview = rflat[: b * (W - 1)].reshape(b, W - 1)
        x = lax.dynamic_slice(rview, (0, jcol - p + off), (b, 1))[:, 0]
        v, tau = _house_pivot0(x)
        asub = lax.dynamic_slice(rview, (0, b - 1), (b, win))
        asub = asub - tau * jnp.outer(v, v @ asub)
        rview = lax.dynamic_update_slice(rview, asub, (0, b - 1))
        rowpart = jnp.concatenate(
            [rview.reshape(-1), rflat[b * (W - 1):]]).reshape(b, W)
        B = lax.dynamic_update_slice(B, rowpart, (b + 1, 0))
        # sheared column view (flat offset 1 so the last column fits):
        # cview[i, q] = B.flat[i*(W-1) + q + 1], so B[i, j - i + 3b+1]
        # = cview[i, j + 3b]
        bflat = B.reshape(-1)
        cview = bflat[1: 1 + win * (W - 1)].reshape(win, W - 1)
        bsub = cview[:, 3 * b: 4 * b]
        bsub = bsub - tau * jnp.outer(bsub @ v, v)
        cview = lax.dynamic_update_slice(cview, bsub, (0, 3 * b))
        B = jnp.concatenate(
            [bflat[:1], cview.reshape(-1),
             bflat[1 + win * (W - 1):]]).reshape(win, W)
        wb = lax.dynamic_update_slice(wb, B, (pad + p - b - 1, 0))
        HVc = lax.dynamic_update_slice(HVc, v[None, :], (t, 0))
        HTc = HTc.at[t].set(tau)
        return (wb, HVc, HTc)

    hvc0 = jnp.zeros((T, b), dtype)
    htc0 = jnp.zeros((T,), dtype)
    return lax.fori_loop(0, T, chase, (wb, hvc0, htc0))


def band_to_tridiag_chunked(band: jax.Array, bw: int,
                            mesh: Optional[Mesh] = None,
                            chunks: int = 4) -> ChaseResult:
    """Host-staged sequential chase: ``chunks`` separate jit calls.

    The in-flight (necessarily replicated — every device runs the same
    window recurrence) reflector buffer is only n^2/chunks; completed
    chunks persist SWEEP-SHARDED across the mesh, so peak per-device
    memory is n^2/chunks + n^2/P instead of n^2.  Also keeps each remote
    TPU compile small.  Reflectors are bit-identical to the unchunked
    sequential schedule.
    """
    from functools import partial as _partial

    n = band.shape[0]
    b = bw
    if n <= 2 or bw <= 1 or chunks <= 1:
        return _band_to_tridiag_seq(band, bw, mesh=mesh)
    pad = 3 * b + 2
    T = n // b + 2
    W = 4 * b + 1
    off = 2 * b
    dtype = band.dtype
    n_dev = 1
    if mesh is not None:
        for a in mesh.axis_names:
            n_dev *= mesh.shape[a]
    # equal chunk sizes, divisible by the device count; sweeps beyond
    # n-3 are exact no-ops (their windows read the zero padding)
    step = -(-(n - 2) // chunks)
    step = -(-step // n_dev) * n_dev

    @jax.jit
    def init(band):
        wb = jnp.zeros((n + 2 * pad, W), dtype)
        return lax.dynamic_update_slice(wb, _banded_state(band, b, mesh),
                                        (pad, 0))

    @_partial(jax.jit, static_argnames=("c0",))
    def run_chunk(wb, c0):
        def sweep(wb, c):
            wb, HVc, HTc = _chunk_sweep_body(wb, c, n, b, T, W, off, pad,
                                             dtype)
            return wb, (HVc, HTc)

        wb, (HVs, HTs) = lax.scan(sweep, wb, c0 + jnp.arange(step))
        HVs, HTs = _shard_chase_store(HVs, HTs, mesh)
        return wb, HVs, HTs

    wb = init(band)
    hvs, hts = [], []
    for i in range(chunks):
        wb, hvc, htc = run_chunk(wb, i * step)
        hvs.append(hvc)
        hts.append(htc)
    HV = jnp.concatenate(hvs, axis=0)[:n]
    HT = jnp.concatenate(hts, axis=0)[:n]
    if HV.shape[0] < n:
        HV = jnp.concatenate(
            [HV, jnp.zeros((n - HV.shape[0], T, b), dtype)], axis=0)
        HT = jnp.concatenate(
            [HT, jnp.zeros((n - HT.shape[0], T), dtype)], axis=0)
    HV, HT = _shard_chase_store(HV, HT, mesh)
    d = wb[pad:pad + n, off]
    e = wb[pad + 1:pad + n, off - 1]
    return ChaseResult(d=d, e=e, HV=HV, HT=HT, bw=jnp.asarray(bw, jnp.int32))


def apply_chase_q_blocked_sharded(res: ChaseResult, z: jax.Array, bw: int,
                                  group: int, mesh: Mesh) -> jax.Array:
    """Mesh version of :func:`apply_chase_q_blocked` with NO replicated
    O(n^2) state.

    Layout: z is COLUMN-sharded over every mesh device (each device holds
    all rows of its column slab, so every window update is local — zero
    communication on z); the (n, T, bw) reflector store is sharded over
    the sweep axis across all devices, and each group's (g, T, bw) slab is
    broadcast exactly once per group via a masked psum — total traffic
    equals reading the reflectors once, peak per-device reflector memory
    is n^2/P + one slab.
    """
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    n, k = z.shape
    b = bw
    T = res.HV.shape[1]
    if n <= 2 or bw <= 1 or res.HV.shape[0] < n:
        return z
    if group <= 0:
        group = b if jax.default_backend() == "tpu" else 32
    g = min(group, b)
    nsweeps = n - 2
    axes = tuple(mesh.axis_names)
    nP = 1
    for a in axes:
        nP *= mesh.shape[a]
    n_groups = -(-nsweeps // g)
    n_groups = -(-n_groups // nP) * nP      # shard the sweep axis evenly
    S = n_groups * g
    L = b + g - 1
    dtype = z.dtype

    front = S - nsweeps                      # zero-reflector front padding
    HVp = jnp.concatenate(
        [jnp.zeros((front, T, b), dtype), res.HV[:nsweeps]], axis=0)
    HTp = jnp.concatenate(
        [jnp.zeros((front, T), dtype), res.HT[:nsweeps]], axis=0)
    kp = -(-k // nP) * nP
    zc = z if kp == k else \
        jnp.zeros((n, kp), dtype).at[:, :k].set(z)

    top = g + 1
    padz = (T + 2) * b + g
    zp = jnp.zeros((n + top + padz, kp), dtype)
    zp = lax.dynamic_update_slice(zp, zc, (top, 0))

    rows_loc = S // nP
    k_loc = kp // nP
    r_arr = jnp.arange(L)
    j_arr = jnp.arange(g)
    emb_q = r_arr[:, None] - (g - 1) + j_arr[None, :]
    emb_ok = (emb_q >= 0) & (emb_q < b)

    def body(hv_loc, ht_loc, z_loc):
        me = jnp.int32(0)
        mult = 1
        for a in reversed(axes):
            me = me + lax.axis_index(a) * mult
            mult *= mesh.shape[a]

        def group_step(G, z_loc):
            c0 = nsweeps - 1 - G * g
            gstart = S - (G + 1) * g         # g-aligned, single owner
            owner = gstart // rows_loc
            loc0 = gstart - owner * rows_loc
            hv_blk = lax.dynamic_slice(hv_loc, (loc0, 0, 0), (g, T, b))
            ht_blk = lax.dynamic_slice(ht_loc, (loc0, 0), (g, T))
            sel = (me == owner).astype(dtype)
            hv_blk = lax.psum(hv_blk * sel, axes)   # broadcast from owner
            ht_blk = lax.psum(ht_blk * sel, axes)
            hv_desc = hv_blk[::-1]
            ht_desc = ht_blk[::-1]

            def pos_step(t, z_loc):
                hv_t = lax.dynamic_slice(hv_desc, (0, t, 0), (g, 1, b))[:, 0]
                ht_t = lax.dynamic_slice(ht_desc, (0, t), (g, 1))[:, 0]
                Y = _wy_embed(hv_t, g, b, L, emb_ok)
                gram = Y.T @ Y
                tau_safe = jnp.where(ht_t == 0, 1.0, ht_t)
                M = jnp.tril(gram, -1) + jnp.diag(1.0 / tau_safe)
                row0 = c0 - g + 2 + t * b + top
                zw = lax.dynamic_slice(z_loc, (row0, 0), (L, k_loc))
                w2 = jax.scipy.linalg.solve_triangular(M, Y.T @ zw,
                                                       lower=True)
                zw = zw - Y @ w2
                return lax.dynamic_update_slice(z_loc, zw, (row0, 0))

            return lax.fori_loop(0, T, pos_step, z_loc)

        return lax.fori_loop(0, n_groups, group_step, z_loc)

    out = shard_map(
        body, mesh=mesh,
        in_specs=(P(axes, None, None), P(axes, None), P(None, axes)),
        out_specs=P(None, axes), check_rep=False)(HVp, HTp, zp)
    return out[top:top + n, :k]


def band_to_tridiag_wavefront2(band: jax.Array, bw: int,
                               mesh: Optional[Mesh] = None) -> ChaseResult:
    """Lean stagger-4 pipelined chase on LOWER-triangle banded storage.

    Same reflectors and schedule as :func:`band_to_tridiag_wavefront`, with
    three structural cost cuts measured against it on TPU:

    * the state is the lower half only — ``lb[i, q] = A[i, i+q-2b]``,
      ``q in [0, 2b]`` (W = 2b+1 instead of 4b+1): a symmetric two-sided
      window touches rows [p, p+2b) of the lower storage and nothing
      above p, so the upper half never needs to exist;
    * ONE covering slice + ONE write-back per step (the 4b+1 variant pays
      two of each: disjoint row- and column-tile covers);
    * all three per-window faces are column-aligned views of that single
      chunk at flat row stride 2b:
        V1[r, s] = A[p+r, p-b-1+s]   (left strip s<b+1, D lower s>=b+1)
        V2[r, s] = A[p+b+r, p+s]     (bulge fill rows)
      so the whole two-sided update is static reshapes + rank-1 batched
      GEMLets, no gathers.

    The only cross-lane hazard would be lane j+1's pivot column, created
    by lane j's fill — at stride 4b-1 the touched spans [p, p+2b) are
    disjoint with b-1 rows to spare (stagger-3 fails by exactly one row:
    the (p+2b-1, p+b-1) fill IS the next window's pivot top).
    """
    n = band.shape[0]
    dtype = band.dtype
    b = bw
    if n <= 2 or bw <= 1:
        return _band_to_tridiag_seq(band, bw, mesh=mesh)
    W = 2 * b + 1
    T = n // b + 2
    nW = (T + 3) // 4 + 1
    pad = 2 * b + 2
    tau_max = 4 * (n - 3) + T
    p0_max = (tau_max - 1) // 4 + 1 + 3 * b
    rows_tot = pad + p0_max + nW * (4 * b - 1) + 2 * b + 2
    w = jnp.zeros((rows_tot, W), dtype)
    w = lax.dynamic_update_slice(w, _banded_state(band, b, mesh, W=W),
                                 (pad, 0))
    # the scan carry is the FLAT 1D state: on TPU a (rows, W) array is
    # physically tiled with the minor dim padded to 128, so reshaping it
    # per step is a full relayout copy and the big dynamic_update_slice
    # loses in-place updating (profiled at ~130 us/step of pure data
    # movement on v5e).  A 1D carry keeps the per-step slice/update
    # contiguous and in-place; only the O(nW * stride) cover is ever
    # reshaped.
    wflat = w.reshape(-1)
    jarr = jnp.arange(nW)
    stride = (4 * b - 1) * W
    cover = nW * stride
    chklen = 4 * b * b + 2 * b
    r_ = jnp.arange(b)
    tril = r_[:, None] >= r_[None, :]                    # (b, b) r' <= r
    eye_b = jnp.eye(b, dtype=dtype)

    def step(flat, tau):
        t = (tau % 4) + 4 * jarr                         # (nW,)
        c = tau // 4 - jarr
        p0 = tau // 4 + 1 + (tau % 4) * b
        p = c + 1 + t * b                                # = p0 + j*(4b-1)
        jcol = jnp.where(t == 0, c, p - b)
        live = ((c >= 0) & (c <= n - 3) & (t <= T - 1)
                & (p < n - 1) & (jcol < n - 1))

        base = (pad + p0) * W
        cov = lax.dynamic_slice(flat, (base,), (cover,)).reshape(nW, stride)
        chunk = cov[:, :chklen]
        v1 = chunk[:, b - 1: b - 1 + 2 * b * b].reshape(nW, b, 2 * b)
        corner = chunk[:, b - 1 + 2 * b * b]             # A[p+b-1, p+b-1]
        v2full = chunk[:, 2 * b * b + 2 * b:].reshape(nW, b, 2 * b)
        v2 = v2full[:, :, :b]                            # A[p+b+r, p+s]

        # pivot column: s = b for the single t==0 lane (jcol = c = p-1),
        # s = 1 otherwise (jcol = p-b) — select of two static slices
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
                             lv[:, None]], axis=1)       # (nW, b)
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
        dv = jnp.sum(dfull * v[:, None, :], axis=2)      # (nW, b)
        vdv = jnp.sum(v * dv, axis=1)[:, None, None]
        dnew = (dfull - th * (v[:, :, None] * dv[:, None, :])
                - th * (dv[:, :, None] * v[:, None, :])
                + th * th * vdv * (v[:, :, None] * v[:, None, :]))
        # left strip (cols p-b-1..p-1): rows-of-S mix, valid for all r
        lft = v1[:, :, :b + 1]
        coef_l = jnp.sum(v[:, :, None] * lft, axis=1)    # (nW, b+1)
        lft = lft - th * (v[:, :, None] * coef_l[:, None, :])
        # bulge fill rows (right strip): cols-of-S mix
        coef_r = jnp.sum(v2 * v[:, None, :], axis=2)     # (nW, b)
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
        flat = lax.dynamic_update_slice(flat, cov.reshape(-1), (base,))

        c_s = jnp.where(live, c, n)
        t_s = jnp.minimum(t, T - 1)
        return flat, (v, tau_h, c_s, t_s)

    wflat, (vs, ths, cs, ts) = lax.scan(step, wflat, jnp.arange(tau_max))
    w = wflat.reshape(-1, W)
    cs = cs.reshape(-1)
    ts = ts.reshape(-1)
    HV = jnp.zeros((n + 1, T, b), dtype).at[cs, ts, :].set(
        vs.reshape(-1, b), mode="drop")
    HT = jnp.zeros((n + 1, T), dtype).at[cs, ts].set(
        ths.reshape(-1), mode="drop")
    d = w[pad:pad + n, 2 * b]
    e = w[pad + 1:pad + n, 2 * b - 1]
    HV, HT = _shard_chase_store(HV[:n], HT[:n], mesh)
    return ChaseResult(d=d, e=e, HV=HV, HT=HT,
                       bw=jnp.asarray(bw, jnp.int32))


def band_to_tridiag_wavefront(band: jax.Array, bw: int,
                              mesh: Optional[Mesh] = None) -> ChaseResult:
    """Stagger-4 pipelined bulge chasing (the multi-bulge variant).

    Sweeps start 4 chase steps apart; at global step tau the active
    (sweep, position) pairs are ``t_j = (tau mod 4) + 4j``,
    ``c_j = tau//4 - j`` whose windows sit a uniform ``4*bw - 1`` rows
    apart — always disjoint (any reordering relative to the sequential
    schedule only swaps commuting window-disjoint reflectors, so the
    computed reflectors are IDENTICAL to the sequential ones and
    :func:`apply_chase_q` applies unchanged).  Each step gathers all
    active windows as one batched (W, bw, 3bw+1) tile, applies batched
    two-sided rank-1 updates, and scatters back: ~n^2/(2 bw) sequential
    chases collapse into ``4n + T`` batched steps.

    Dead lanes (pipeline fill/drain) read the enlarged zero padding; their
    reflectors are exactly zero so the written-back windows are
    value-preserving no-ops.
    """
    n = band.shape[0]
    dtype = band.dtype
    b = bw
    if n <= 2 or bw <= 1:
        return _band_to_tridiag_seq(band, bw, mesh=mesh)
    pad = 5 * b
    T = n // b + 2
    nW = (T + 3) // 4 + 1
    win = 3 * b + 1
    W = 4 * b + 1
    off = 2 * b
    # rows must cover the highest window's covering slice at any step
    # (uniform-stride multi-window views, see below) — still O(n*bw)
    tau_max = 4 * (n - 3) + T
    p0_max = (tau_max - 1) // 4 + 1 + 3 * b
    rows_total = pad + p0_max + nW * (4 * b - 1) + 2
    w = jnp.zeros((rows_total, W), dtype)
    w = lax.dynamic_update_slice(w, _banded_state(band, b, mesh), (pad, 0))
    jarr = jnp.arange(nW)

    # Flat-stride window views with no element gathers in the two-sided
    # band update (the O(n*bw) gathers are what made the first design 34x
    # slower; the only remaining scatter is the one post-scan reflector
    # store assembly below): one
    # wavefront step's windows sit at a UNIFORM row stride 4b-1 (p_j =
    # p_0 + j*(4b-1)), so the whole multi-window view is a single
    # dynamic_slice of the flattened banded array reshaped into per-window
    # chunks of (4b-1)*W elements:
    #   A[p_j+i, p_j-b-1+q]  = chunk_j[(b-1)  + i*(W-1) + q]  (row tile)
    #   A[p_j-b-1+i, p_j+q]  = chunk_j'[(3b+1) + i*(W-1) + q] (col tile)
    # Dead lanes read the enlarged zero padding (their reflectors are 0,
    # so the written-back delta is 0) — the banded state is extended to
    # cover the highest window of any step (still O(n*bw)).
    stride = (4 * b - 1) * W
    cover = nW * stride

    def step(w, tau):
        t = (tau % 4) + 4 * jarr                  # (nW,)
        c = tau // 4 - jarr
        live = (c >= 0) & (c <= n - 3) & (t <= T - 1)
        p0 = tau // 4 + 1 + (tau % 4) * b         # window j=0 (lowest rows)
        p = c + 1 + t * b                         # = p0 + j*(4b-1)
        jcol = jnp.where(t == 0, c, p - b)
        live = live & (p < n - 1) & (jcol < n - 1)

        flat = w.reshape(-1)
        base_r = (pad + p0) * W + (b - 1)
        base_c = (pad + p0 - b - 1) * W + (3 * b + 1)
        cov_r = lax.dynamic_slice(flat, (base_r,), (cover,))
        tile_r = cov_r.reshape(nW, stride)[:, :b * (W - 1)].reshape(
            nW, b, W - 1)
        # tile_r[j, i, q] = A[p_j+i, p_j-b-1+q] for q < win;
        # the pivot column A[:, jcol] sits at q = jcol - p + b + 1, which
        # is b for the single t==0 lane (jcol=c, p=c+1) and 1 everywhere
        # else — a select between two STATIC column slices, not a gather
        x = jnp.where((t == 0)[:, None], tile_r[:, :, b], tile_r[:, :, 1])
        x = x * live[:, None].astype(dtype)
        tail = x[:, 1:]
        sigma = jnp.sum(tail * tail, axis=1)
        zero_tail = sigma == 0
        alpha = x[:, 0]
        sgn = jnp.where(alpha >= 0, 1.0, -1.0).astype(dtype)
        beta = jnp.where(zero_tail, alpha,
                         -sgn * jnp.sqrt(alpha * alpha + sigma))
        denom = jnp.where(zero_tail, 1.0, alpha - beta).astype(dtype)
        lv = jnp.logical_and(jnp.logical_not(zero_tail), live).astype(dtype)
        v = jnp.concatenate([lv[:, None], tail / denom[:, None] *
                             lv[:, None]], axis=1)          # (nW, b)
        tau_h = lv * jnp.where(zero_tail, 0.0,
                               (beta - alpha) /
                               jnp.where(beta == 0, 1.0, beta))

        # two-sided update on the batched disjoint windows: modify the
        # covering slice in place, write it back with ONE dynamic update
        win_r = tile_r[:, :, :win]                          # (nW, b, win)
        coef = jnp.einsum("wb,wbc->wc", v, win_r) * tau_h[:, None]
        win_r = win_r - v[:, :, None] * coef[:, None, :]
        cov_r = cov_r.reshape(nW, stride).at[:, :b * (W - 1)].set(
            tile_r.at[:, :, :win].set(win_r).reshape(nW, -1)).reshape(-1)
        flat = lax.dynamic_update_slice(flat, cov_r, (base_r,))

        cov_c = lax.dynamic_slice(flat, (base_c,), (cover,))
        tile_c = cov_c.reshape(nW, stride)[:, :win * (W - 1)].reshape(
            nW, win, W - 1)
        win_c = tile_c[:, :, :b]                            # (nW, win, b)
        coef2 = jnp.einsum("wcb,wb->wc", win_c, v) * tau_h[:, None]
        win_c = win_c - coef2[:, :, None] * v[:, None, :]
        cov_c = cov_c.reshape(nW, stride).at[:, :win * (W - 1)].set(
            tile_c.at[:, :, :b].set(win_c).reshape(nW, -1)).reshape(-1)
        flat = lax.dynamic_update_slice(flat, cov_c, (base_c,))
        w = flat.reshape(-1, W)

        c_s = jnp.where(live, c, n)
        t_s = jnp.minimum(t, T - 1)
        # reflectors leave as scan OUTPUTS — a per-step scatter into the
        # O(n^2) store would rewrite (or copy) the big carry every step
        return w, (v, tau_h, c_s, t_s)

    w, (vs, ths, cs, ts) = lax.scan(step, w, jnp.arange(tau_max))
    cs = cs.reshape(-1)
    ts = ts.reshape(-1)
    HV = jnp.zeros((n + 1, T, b), dtype).at[cs, ts, :].set(
        vs.reshape(-1, b), mode="drop")
    HT = jnp.zeros((n + 1, T), dtype).at[cs, ts].set(
        ths.reshape(-1), mode="drop")
    d = w[pad:pad + n, off]
    e = w[pad + 1:pad + n, off - 1]
    HV, HT = _shard_chase_store(HV[:n], HT[:n], mesh)
    return ChaseResult(d=d, e=e, HV=HV, HT=HT,
                       bw=jnp.asarray(bw, jnp.int32))
