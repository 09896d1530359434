"""Tridiagonal divide & conquer (Cuppen) — the pdstedc analog.

Reference parity: ``pdstedc`` (solver_scalapack_all.f90:96) and the D&C
solve stages inside ELPA/EigenExa.  The reference delegates to ScaLAPACK's
recursive MPI implementation; this is a from-scratch TPU-first design:

* **bottom-up batched merge tree** — all merges of one level run as a
  single ``vmap`` over uniform static shapes (no recursion, no dynamic
  shapes), so each level is one XLA computation with the flop-heavy
  eigenvector assembly expressed as two large GEMMs per merge (MXU work);
* **rank-one decomposition with non-negative rho** — the coupling at each
  merge middle ``m`` is written ``|e_m| * v v^T`` with
  ``v = e_m_unit + sign(e_m) * e_{m+1}_unit``, so the secular function is
  always increasing and every root is bracketed by consecutive poles;
  the two boundary-diagonal adjustments of every merge (all levels) are
  precomputed up front, which is what turns the classic recursion into a
  flat bottom-up sweep;
* **dlaed2-style deflation as masked scans** — type-1 (tiny rank-one
  weight) via a mask; type-2 (close eigenvalues) via one ``lax.scan``
  that emits Givens records and finalized (d, u) pairs, all static-shape;
  compaction = one stable argsort;
* **secular solver**: all K roots of one merge solved simultaneously by
  safeguarded Newton (bisection fallback) on pole-anchored offsets
  ``mu = lambda - delta_anchor`` — anchoring at the *nearer* pole keeps
  every distance-to-pole fully accurate, which the Gu/Eisenstat weight
  recomputation below needs;
* **Gu–Eisenstat (Loewner) weights** — the rank-one weights are recomputed
  from the computed roots, so eigenvectors are numerically orthogonal
  without the iterative-refinement dance of inverse iteration.

The result is an all-eigenpairs tridiagonal core whose arithmetic is
dominated by the per-level GEMMs Q_half @ S (~(4/3) n^3 madds total) —
exactly the shape the MXU wants — while the sequential parts (deflation
scan, rotation replay) are O(n) steps of O(n) work.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh


def _lane_wsc(x, mesh):
    """Column(lane)-shard a (terms, lanes) matrix over every mesh device —
    the secular solve and eigenvector build are embarrassingly parallel
    over lanes."""
    if mesh is None:
        return x
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(None, tuple(mesh.axis_names))))


def _secular_newton(dc, uc, rho, m, iters, mesh=None):
    """All roots of ``1 + rho * sum_i uc_i^2 / (dc_i - lam)`` at once.

    dc, uc: (K,) compacted (active-first, d ascending); m: traced count of
    active entries.  Lane j < m finds the root in (dc_j, next pole); lanes
    j >= m are masked garbage.  Returns (anchor, mu): root = anchor + mu,
    with anchor one of the two bracketing poles (the nearer one) so mu is
    fully accurate relative to both pole distances.
    """
    K = dc.shape[0]
    dtype = dc.dtype
    jm = jnp.arange(K)
    act = jm < m
    usum2 = jnp.sum(uc * uc)
    d_last = dc[jnp.clip(m - 1, 0, K - 1)]
    # right interval edge: next pole, or d_max + rho*||u||^2 for the last
    d_next = jnp.where(jm + 1 < m, dc[jnp.clip(jm + 1, 0, K - 1)],
                       d_last + rho * usum2 + jnp.finfo(dtype).tiny)
    delta = jnp.maximum(d_next - dc, jnp.finfo(dtype).tiny)
    safe_u2 = uc * uc

    def feval(lam_col):
        # f(lam_j) batched over lanes j: (K lanes) x (K terms)
        den = dc[:, None] - lam_col[None, :]               # (K terms, K lanes)
        den = jnp.where(safe_u2[:, None] == 0, 1.0, den)
        f = 1.0 + rho * jnp.sum(safe_u2[:, None] / den, axis=0)
        fp = rho * jnp.sum(safe_u2[:, None] / (den * den), axis=0)
        return f, fp

    mid = dc + 0.5 * delta
    fmid, _ = feval(mid)
    last = jm == m - 1
    # anchor at the nearer pole; last interval always anchors left
    right = (fmid < 0) & jnp.logical_not(last)
    anchor = jnp.where(right, d_next, dc)
    dd = _lane_wsc(dc[:, None] - anchor[None, :], mesh)    # exact pole gaps
    lo = jnp.where(right, -0.5 * delta,
                   jnp.where(last & (fmid < 0), 0.5 * delta, 0.0))
    hi = jnp.where(right, 0.0,
                   jnp.where(last & (fmid < 0), delta, 0.5 * delta))

    # Solve in a = |mu| (distance from the anchor pole).  g(a) = +-f is
    # increasing in a; safeguarded Newton with a GEOMETRIC fallback —
    # roots can sit at distance rho*u_i^2 (down to ~1e-28) from the pole
    # when u_i is tiny-but-not-deflated, far below what arithmetic
    # bisection can resolve, and the Loewner weights need mu to full
    # RELATIVE precision.  Multiplicative descent (x 2^-32 per rejection
    # while the lower bound is still 0, geometric-mean bisection after)
    # covers the whole exponent range in a few steps; Newton then
    # converges quadratically.
    sgn = jnp.where(right, -1.0, 1.0).astype(dtype)
    lo_a = jnp.where(last & (fmid < 0), 0.5 * delta, 0.0)
    hi_a = jnp.where(last & (fmid < 0), delta, 0.5 * delta)

    def gmu(a):
        den = dd - (sgn * a)[None, :]
        den = jnp.where(safe_u2[:, None] == 0, 1.0, den)
        f = 1.0 + rho * jnp.sum(safe_u2[:, None] / den, axis=0)
        fp = rho * jnp.sum(safe_u2[:, None] / (den * den), axis=0)
        return sgn * f, fp

    # primary step: one-pole rational model (dlaed4/Melman style) — write
    # g(a) = S(a) - rho*u_anc^2/a with S smooth near the anchor, freeze S,
    # solve exactly: a <- rho*u_anc^2/S.  This lands on pole-hugging roots
    # (a* ~ rho*u^2) in one step, where Newton only doubles per iteration.
    anc_idx = jnp.clip(jnp.where(right, jm + 1, jm), 0, K - 1)
    u_anc2 = safe_u2[anc_idx]

    def body(i, state):
        lo, hi, a = state
        g, fp = gmu(a)
        below = g < 0                     # a is left of the root
        lo = jnp.where(below, a, lo)
        hi = jnp.where(below, hi, a)
        S = g + rho * u_anc2 / a
        a_rat = rho * u_anc2 / S
        ok_r = (S > 0) & jnp.isfinite(a_rat) & (a_rat > lo) & (a_rat < hi)
        a_n = a - g / jnp.where(fp == 0, 1.0, fp)
        ok_n = (a_n > lo) & (a_n < hi) & jnp.isfinite(a_n) & (fp > 0)
        fallback = jnp.where(lo > 0, jnp.sqrt(lo * hi), hi * (2.0 ** -32))
        # odd iterations force the geometric bisection: the rational step
        # can cycle when the anchor weight is tiny but the root is not
        # pole-hugging (S ~ 0); the forced halving guarantees global
        # convergence, the smart steps give the final relative precision.
        smart = jnp.where(ok_r, a_rat, jnp.where(ok_n, a_n, fallback))
        a = jnp.where((i % 2 == 1) & (i < iters - 12), fallback, smart)
        return lo, hi, a

    a0 = 0.5 * (lo_a + hi_a)
    lo_a, hi_a, a = lax.fori_loop(0, iters, body, (lo_a, hi_a, a0))
    mu = jnp.where(act, sgn * a, 0.0)
    return anchor, mu, dd, right


def _merge_one(w1, w2, q1, q2, e_mid, iters, mesh=None):
    """Merge two solved halves across one coupling element ``e_mid``.

    w1, w2: (K2,) ascending eigenvalues of the (pre-adjusted) halves;
    q1, q2: (K2, K2) their eigenvectors; e_mid the subdiagonal joining
    them.  Returns (w, q) of the union, w ascending, q = blkdiag(q1,q2)@S.

    With ``mesh``, the O(K^2) temporaries shard over the lane axis and the
    assembly GEMMs shard 2D (the pdstedc distribution analog); the O(K)
    sequential parts (sort, deflation scan, rotation replay) stay
    replicated.
    """
    K2 = w1.shape[0]
    K = 2 * K2
    dtype = w1.dtype
    eps = jnp.finfo(dtype).eps
    rho = jnp.abs(e_mid)
    s_sign = jnp.where(e_mid >= 0, 1.0, -1.0).astype(dtype)

    d = jnp.concatenate([w1, w2])
    u = jnp.concatenate([q1[K2 - 1, :], s_sign * q2[0, :]])

    sortp = jnp.argsort(d)
    ds = d[sortp]
    us = u[sortp]

    scale = jnp.maximum(jnp.max(jnp.abs(ds)), rho)
    tol = 8.0 * eps * jnp.maximum(scale, jnp.finfo(dtype).tiny)
    alive = rho * jnp.abs(us) > tol                  # not type-1 deflated

    # ---- type-2 deflation scan (dlaed2 analog): rotate pairs with
    # negligible coupling |t*c*s|; emit finalized (idx, d, u) + rotations.
    def t2step(carry, inp):
        has_prev, ip, dp, up = carry
        i, di, ui, al = inp
        r = jnp.sqrt(up * up + ui * ui)
        r_safe = jnp.where(r == 0, 1.0, r)
        c = ui / r_safe
        sn = up / r_safe
        close = has_prev & al & (jnp.abs((di - dp) * c * sn) <= tol)
        # finalized this step: rotated-away prev (close), or displaced
        # prev (alive & !close), or the dead entry i itself (!alive)
        fin_rot = close
        fin_prev = has_prev & al & jnp.logical_not(close)
        fin_self = jnp.logical_not(al)
        fin_valid = fin_rot | fin_prev | fin_self
        fin_idx = jnp.where(fin_self, i, ip)
        fin_d = jnp.where(fin_rot, c * c * dp + sn * sn * di,
                          jnp.where(fin_self, di, dp))
        fin_u = jnp.where(fin_prev, up, 0.0)
        rot = (ip, i, c, sn, close)
        new_has = has_prev | al
        new_ip = jnp.where(al, i, ip)
        new_dp = jnp.where(al, jnp.where(close, sn * sn * dp + c * c * di,
                                         di), dp)
        new_up = jnp.where(al, jnp.where(close, r, ui), up)
        out = (fin_idx, fin_d, fin_u, fin_valid) + rot
        return (new_has, new_ip, new_dp, new_up), out

    idx = jnp.arange(K)
    init = (jnp.asarray(False), jnp.asarray(0, idx.dtype),
            jnp.asarray(0.0, dtype), jnp.asarray(0.0, dtype))
    # unroll: the scan is K steps of O(1) scalar work — loop-control
    # overhead dominates on TPU; unrolling cuts it without changing the
    # sequential recurrence (EK_DC_UNROLL for A/B; compile size grows
    # with it)
    import os

    unroll = int(os.environ.get("EK_DC_UNROLL", "8"))
    (has_p, ip, dp, up), outs = lax.scan(t2step, init, (idx, ds, us, alive),
                                         unroll=unroll)
    fin_idx, fin_d, fin_u, fin_valid, rot_ip, rot_i, rot_c, rot_s, rot_m = \
        outs

    drop = jnp.where(fin_valid, fin_idx, K)          # K = out-of-bounds drop
    d2 = ds.at[drop].set(fin_d, mode="drop")
    u2 = jnp.zeros_like(us).at[drop].set(fin_u, mode="drop")
    # flush the final carry (last survivor)
    d2 = d2.at[jnp.where(has_p, ip, K)].set(dp, mode="drop")
    u2 = u2.at[jnp.where(has_p, ip, K)].set(up, mode="drop")

    active = u2 != 0
    m = jnp.sum(active.astype(jnp.int32))
    # compact: active first, d order preserved (stable sort on the flag)
    pi = jnp.argsort(jnp.logical_not(active).astype(jnp.int32), stable=True)
    dc = d2[pi]
    uc = u2[pi]

    anchor, mu, dd, _ = _secular_newton(dc, uc, rho, m, iters, mesh=mesh)
    jm = jnp.arange(K)
    act = jm < m
    lam_act = anchor + mu

    # ---- Gu/Eisenstat recomputed weights:
    # uhat_i^2 = prod_j (lam_j - dc_i) / (rho * prod_{j!=i} (dc_j - dc_i))
    # paired j<->j so every factor is O(1); pole-adjacent differences use
    # the exact (dd, mu) representation.
    lam_m_d = _lane_wsc(mu[None, :] - dd, mesh)       # lam_j - dc_i, (K, K)
    d_m_d = _lane_wsc(dc[:, None] - dc[None, :], mesh)  # dc_i - dc_j
    offdiag = (jm[:, None] != jm[None, :])
    valid = offdiag & act[None, :] & act[:, None]
    ratio = jnp.where(valid, lam_m_d / jnp.where(valid, -d_m_d, 1.0), 1.0)
    prod = jnp.prod(ratio, axis=1)                    # (K,) over j
    diag_term = jnp.take_along_axis(lam_m_d, jm[:, None], axis=1)[:, 0]
    uhat2 = jnp.where(act, diag_term * prod /
                      jnp.where(rho == 0, 1.0, rho), 0.0)
    uhat = jnp.sqrt(jnp.maximum(uhat2, 0.0)) * jnp.where(uc < 0, -1.0, 1.0)

    # ---- eigenvector matrix in compacted space: S[i,j] = uhat_i/(dc_i-l_j)
    den = dd - mu[None, :]
    den = jnp.where(valid | (jm[:, None] == jm[None, :]) &
                    act[:, None] & act[None, :], den, 1.0)
    S = uhat[:, None] / den
    eye = jnp.eye(K, dtype=dtype)
    both_act = act[:, None] & act[None, :]
    S = jnp.where(both_act, S, eye)
    S = _lane_wsc(S / jnp.linalg.norm(S, axis=0, keepdims=True), mesh)

    lam_all = jnp.where(act, lam_act, dc)

    # ---- un-compact rows (C -> sorted-D space)
    S_D = jnp.zeros_like(S).at[pi, :].set(S)
    # ---- replay type-2 rotations in reverse (G^T on row pairs), batched
    # by CHAIN DEPTH: rotations sharing a row form consecutive chains
    # (the t2 carry threads the surviving index), and all depth-d members
    # of different chains touch disjoint row pairs — so the replay is one
    # batched gather/rotate/scatter per depth level, and the while loop
    # runs only max-chain-depth+1 times (0 iterations when nothing
    # deflated type-2; a K-step fori of 2-row updates made XLA copy the
    # whole K^2 buffer per step).
    def depth_step(carry, inp):
        last_i, last_d = carry
        ipr, ir, m = inp
        d = jnp.where(m & (ipr == last_i), last_d + 1, 0)
        last_i = jnp.where(m, ir, last_i)
        last_d = jnp.where(m, d, last_d)
        return (last_i, last_d), d

    idt = rot_ip.dtype
    (_, _), depths = lax.scan(
        depth_step, (jnp.asarray(-1, idt), jnp.asarray(0, idt)),
        (rot_ip, rot_i, rot_m), unroll=unroll)
    depths = jnp.where(rot_m, depths, -1)
    maxd = jnp.max(depths)

    def replay_batch(carry):
        d, Spad = carry
        sel = depths == d
        i1 = jnp.where(sel, rot_ip, K)        # K = junk row
        i2 = jnp.where(sel, rot_i, K)
        cb = jnp.where(sel, rot_c, 1.0)[:, None]
        sb = jnp.where(sel, rot_s, 0.0)[:, None]
        r1 = Spad[i1, :]
        r2 = Spad[i2, :]
        Spad = Spad.at[i1, :].set(cb * r1 + sb * r2)
        Spad = Spad.at[i2, :].set(-sb * r1 + cb * r2)
        return d - 1, Spad

    Spad = jnp.concatenate([S_D, jnp.zeros((1, K), dtype)], axis=0)
    _, Spad = lax.while_loop(lambda c: c[0] >= 0, replay_batch,
                             (maxd, Spad))
    S_D = Spad[:K]

    # ---- un-sort rows (D -> original concat order)
    S_O = jnp.zeros_like(S_D).at[sortp, :].set(S_D)
    # ---- sort columns by eigenvalue
    cperm = jnp.argsort(lam_all)
    w = lam_all[cperm]
    S_O = S_O[:, cperm]

    if mesh is not None:
        from eigenkernel_tpu.ops.blocked import _wsc
        S_O = _wsc(S_O, mesh)
        q1 = _wsc(q1, mesh)
        q2 = _wsc(q2, mesh)
        q = jnp.concatenate([_wsc(q1 @ S_O[:K2, :], mesh),
                             _wsc(q2 @ S_O[K2:, :], mesh)], axis=0)
        return w, _wsc(q, mesh)
    q = jnp.concatenate([q1 @ S_O[:K2, :], q2 @ S_O[K2:, :]], axis=0)
    return w, q


def _tree_shape(n: int, leaf_target: int = 64):
    """Pick (base, levels) with base*2^levels >= n and small padding."""
    if n <= leaf_target:
        return n, 0
    levels = 1
    while leaf_target * (1 << levels) < n:
        levels += 1
    base = -(-n // (1 << levels))            # ceil
    base = -(-base // 8) * 8                 # round to 8 (sublane tile)
    return base, levels


def tridiag_dc(d: jax.Array, e: jax.Array,
               mesh: Optional[Mesh] = None,
               iters: Optional[int] = None):
    """All eigenpairs of the symmetric tridiagonal (d, e) by batched D&C.

    Returns (w, q): w (n,) ascending, q (n, n) orthonormal columns.
    """
    import os

    n = d.shape[0]
    dtype = d.dtype
    if iters is None:
        # fixed-count safeguarded Newton (jit-static); EK_DC_ITERS
        # overrides for A/B — the defaults carry margin (the rational +
        # geometric-bisection hybrid typically converges in < 15)
        iters = int(os.environ.get("EK_DC_ITERS", "0")) or \
            (60 if dtype == jnp.float64 else 30)
    base, levels = _tree_shape(n)
    N = base << levels

    if N > n:
        # decoupled sentinel padding: e=0 at the junction makes every
        # padded coupling rho exactly 0 -> full deflation, exact no-op
        span = jnp.max(jnp.abs(d)) + (jnp.max(jnp.abs(e)) if n > 1 else 0.0)
        big = 3.0 * span + 1.0
        pad_vals = big * (1.0 + jnp.arange(N - n, dtype=dtype))
        d = jnp.concatenate([d, pad_vals])
        e = jnp.concatenate([e, jnp.zeros((N - n + 1,), dtype)])[:N - 1]
    e_full = jnp.concatenate([e, jnp.zeros((1,), dtype)])  # (N,)

    # ---- precompute all boundary-diagonal adjustments (every merge, every
    # level, subtract |e_mid| from both middle entries) — this is what
    # flattens Cuppen's recursion into a bottom-up sweep.
    d_adj = d
    for lvl in range(1, levels + 1):
        half = base << (lvl - 1)
        mids = jnp.arange(N // (2 * half)) * (2 * half) + half  # right-half starts
        rho_l = jnp.abs(e_full[mids - 1])
        d_adj = d_adj.at[mids - 1].add(-rho_l)
        d_adj = d_adj.at[mids].add(-rho_l)

    # ---- leaves: batched dense eigh of base x base tridiagonal blocks
    nb = N // base
    db = d_adj.reshape(nb, base)
    eb = e_full.reshape(nb, base)[:, :base - 1]

    def leaf(dv, ev):
        t = jnp.diag(dv)
        if base > 1:
            t = t + jnp.diag(ev, 1) + jnp.diag(ev, -1)
        return jnp.linalg.eigh(t)

    w, q = jax.vmap(leaf)(db, eb)                 # (nb, base), (nb, base^2)

    # ---- bottom-up merge sweep
    n_dev = 1
    if mesh is not None:
        for a in mesh.axis_names:
            n_dev *= mesh.shape[a]
    for lvl in range(1, levels + 1):
        K2 = base << (lvl - 1)
        nb = N // (2 * K2)
        w = w.reshape(nb, 2, K2)
        q = q.reshape(nb, 2, K2, K2)
        mids = jnp.arange(nb) * (2 * K2) + K2
        e_mid = e_full[mids - 1]
        if mesh is not None and nb <= 4 and (2 * K2) % n_dev == 0 \
                and K2 % n_dev == 0:
            # top levels: few big merges — run them sharded (the flop- and
            # memory-dominant part of the tree)
            outs = [_merge_one(w[i, 0], w[i, 1], q[i, 0], q[i, 1],
                               e_mid[i], iters, mesh=mesh)
                    for i in range(nb)]
            w = jnp.stack([o[0] for o in outs])
            q = jnp.stack([o[1] for o in outs])
        else:
            w, q = jax.vmap(partial(_merge_one, iters=iters))(
                w[:, 0], w[:, 1], q[:, 0], q[:, 1], e_mid)

    w = w.reshape(N)[:n]
    q = q.reshape(N, N)[:n, :n]
    return w, q
