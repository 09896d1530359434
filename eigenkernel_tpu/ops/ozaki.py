"""Ozaki-scheme high-accuracy GEMM built from exact bf16 MXU products.

Why: the Newton refinement (ops/refine.py) needs its residual-forming
GEMMs (A@V, V^T A V, B@V, V^T B V) accurate to ~1e-14 relative, but on
TPU float64 matmuls are software-emulated from float32 pairs and the
lowered product is truncated — measured plateau of the mixed pipeline at
resid ~1.8e-9 (round-2 evidence), far from the BASELINE.md 1e-12 bar,
while the same code reaches 1.2e-15 on CPU.  Rather than paying for an
even slower full double-double GEMM, this module reconstructs an
f64-accurate product from *error-free* bf16 MXU GEMMs (Ozaki, Ogita,
Oishi, Rump 2012 splitting, adapted to the TPU MXU which multiplies
bf16 exactly and accumulates in f32):

  1. scale rows of A (cols of B) by powers of two so entries are in
     (-1, 1) — exact, undone on the result as an outer product;
  2. split each operand into ``q`` signed slices of ``beta`` mantissa
     bits each, every slice exactly representable in bf16
     (slice t holds bits [beta*t, beta*(t+1)) of the scaled entry);
  3. for every slice pair (ta, tb), one bf16xbf16->f32 dot: products
     carry <= 2*beta+2 significant bits and the f32 accumulation over a
     contraction chunk of <= 2^(22-2*beta) terms is EXACT (no rounding
     at all inside the MXU pass);
  4. sum the pair products largest-first into a float32 double-float
     accumulator with error-free TwoSum, so nothing below 2^-48 of the
     leading term is lost.

With beta=5, q=11 this covers the full 53-bit f64 mantissa in
ceil(q*(q+1)/2)=66 native-speed bf16 GEMMs — orders of magnitude faster
than software f64 at the same ~1e-15 relative accuracy (validated
against CPU f64 in tests/test_ozaki.py).

Reference parity: this replaces the implicit "LAPACK is f64 throughout"
assumption of the Fortran reference (solver_lapack.f90, verifier.f90
accuracy model) on hardware whose fast path is bf16.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

DEFAULT_BETA = 5
DEFAULT_Q = 11  # ceil(53 / beta): full f64 mantissa coverage


def _env_q() -> int:
    return int(os.environ.get("EK_OZAKI_Q", str(DEFAULT_Q)))


def _pow2_scale(x: jax.Array, axis: int) -> tuple[jax.Array, jax.Array]:
    """Exact power-of-two row/col scaling: returns (x/s, s) with
    |x/s| < 1 along ``axis`` (the contraction axis is the other one)."""
    m = jnp.max(jnp.abs(x), axis=axis, keepdims=True)
    e = jnp.floor(jnp.log2(jnp.where(m > 0, m, 1.0)))
    s = jnp.exp2(e + 1.0)
    s = jnp.where(m > 0, s, 1.0)
    xs = x / s
    # log2 can be off by one ulp at exact powers of two; repair so the
    # slice-magnitude bound |k| <= 2^beta (hence MXU-exactness) holds.
    bad = jnp.max(jnp.abs(xs), axis=axis, keepdims=True) >= 1.0
    s = jnp.where(bad, 2.0 * s, s)
    return x / s, s


def split_slices(x: jax.Array, contract_axis: int, q: int | None = None,
                 beta: int = DEFAULT_BETA) -> "OzakiOperand":
    """Split a (emulated-)f64 matrix into ``q`` bf16 slices of ``beta``
    mantissa bits, scaled per outer index so every downstream pair GEMM
    is exact.  ``contract_axis`` is the axis that will be contracted."""
    if q is None:
        q = _env_q()
    xs, s = _pow2_scale(x, axis=contract_axis)
    slices = []
    for t in range(q):
        scale_t = 2.0 ** (beta * (t + 1))
        h = jnp.round(xs * scale_t) / scale_t
        hb = h.astype(jnp.bfloat16)
        slices.append(hb)
        # subtract the bf16-roundtripped value (not h): the remainder then
        # telescopes exactly even if the emulated-f64 round is off an ulp
        xs = xs - hb.astype(xs.dtype)
    return OzakiOperand(slices=tuple(slices), scale=s, beta=beta,
                        contract_axis=contract_axis)


class OzakiOperand:
    """Pre-split operand (slices + exact scale).  Splitting A once and
    reusing it across Newton steps amortizes the O(q n^2) extraction."""

    def __init__(self, slices, scale, beta, contract_axis):
        self.slices = slices
        self.scale = scale
        self.beta = beta
        self.contract_axis = contract_axis


def transpose_operand(op: OzakiOperand) -> OzakiOperand:
    """The split of x^T from the split of x (slices transpose; the
    per-outer-index scale carries over) — lets V's split serve both
    A@V (RHS) and V^T(AV) (LHS) in one extraction."""
    return OzakiOperand(slices=tuple(s.T for s in op.slices),
                        scale=op.scale.T, beta=op.beta,
                        contract_axis=1 - op.contract_axis)


def ozaki_matmul_chunked(a: jax.Array, b: jax.Array, q: int | None = None,
                         beta: int = DEFAULT_BETA, out_dtype=None,
                         max_diag: int | None = None,
                         kc: int | None = None,
                         transpose_a: bool = False):
    """``C = a @ b`` like :func:`ozaki_matmul`, but with the slice split
    done PER CONTRACTION CHUNK inside a ``lax.scan``.

    The unchunked form pre-splits both operands full-width — at
    n = 16384 that is ~0.5 GB per bf16 slice and >10 GB resident per
    operand pair — and unrolls every slice-pair GEMM into the caller's
    program, which the XLA memory planner inflated to a 290 GB
    requirement inside the unrolled Newton refinement (r4 chain,
    refine16k).  Here the scan body splits one (m, kc) x (kc, n) block
    pair, runs its ~max_diag^2/2 bf16 GEMMs with TwoSum f32
    accumulation (kc <= 2^(22-2*beta) keeps every product chunk-exact),
    and adds the unscaled block product into an f64 carry — transients
    are O(q*m*kc) and exactly ONE (m, n) GEMM temp is live at a time.
    Accuracy: each block result is exact to the truncation (~2^(-beta*
    max_diag)); the f64 carry adds one eps64 rounding per chunk.

    ``transpose_a=True`` computes ``a.T @ b`` from ``a`` given as
    (k, m) WITHOUT materializing the transpose: chunks slice ROWS of
    ``a`` and the pair GEMMs contract dim 0 of both operands (the MXU
    takes either layout).  At n = 16384 a materialized ``v.T`` costs
    2 GB of layout-copied emulated-f64 hi/lo planes inside the caller's
    program — the single largest avoidable buffer in the r5 refine OOM
    (16.86 GB vs the 15.75 GB HBM capacity).
    """
    if q is None:
        q = _env_q()
    if max_diag is not None:
        q = min(q, max_diag)
    if transpose_a:
        k, m = a.shape
    else:
        m, k = a.shape
    n = b.shape[1]
    if kc is None:
        kc = int(os.environ.get("EK_OZAKI_KC", "2048"))
    kc = min(kc, 1 << (22 - 2 * beta), k)
    nkc = -(-k // kc)
    if nkc * kc > k:
        pad = nkc * kc - k
        if transpose_a:
            a = jnp.concatenate([a, jnp.zeros((pad, m), a.dtype)], axis=0)
        else:
            a = jnp.concatenate([a, jnp.zeros((m, pad), a.dtype)], axis=1)
        b = jnp.concatenate([b, jnp.zeros((pad, n), b.dtype)], axis=0)
    if out_dtype is None:
        out_dtype = jnp.zeros((), jnp.float64).dtype

    def body(c, i):
        # dynamic-slice chunk views, NOT pre-stacked (nkc, m, kc) block
        # copies: the stacked transpose materialized BOTH full operands
        # again (2-4 GB each at n=16384) and double-buffered them across
        # the scan — a large share of the refine16k 74 GB HBM plan
        if transpose_a:
            ab = lax.dynamic_slice(a, (i * kc, 0), (kc, a.shape[1]))
            op_a = split_slices(ab, 0, q, beta)
            dn = (((0,), (0,)), ((), ()))
            scale_a = op_a.scale.reshape(-1, 1)  # (1, m) -> (m, 1)
        else:
            ab = lax.dynamic_slice(a, (0, i * kc), (a.shape[0], kc))
            op_a = split_slices(ab, 1, q, beta)
            dn = (((1,), (0,)), ((), ()))
            scale_a = op_a.scale
        bb = lax.dynamic_slice(b, (i * kc, 0), (kc, b.shape[1]))
        op_b = split_slices(bb, 0, q, beta)
        hi = jnp.zeros((m, n), jnp.float32)
        lo = jnp.zeros((m, n), jnp.float32)
        for s_diag in range(q):
            for ta in range(s_diag + 1):
                tb = s_diag - ta
                if tb >= q:
                    continue
                p = lax.dot_general(
                    op_a.slices[ta], op_b.slices[tb], dn,
                    preferred_element_type=jnp.float32)
                hi, lo = _two_sum_acc(hi, lo, p)
        c = c + (hi.astype(out_dtype) + lo.astype(out_dtype)) \
            * scale_a.astype(out_dtype) * op_b.scale.astype(out_dtype)
        return c, None

    c0 = jnp.zeros((m, n), out_dtype)
    c, _ = lax.scan(body, c0, jnp.arange(nkc))
    return c


def _two_sum_acc(hi: jax.Array, lo: jax.Array, p: jax.Array):
    """Error-free accumulation: (hi + lo) + p with the rounding error of
    the leading add captured into lo (Knuth TwoSum, 6 flops)."""
    s = hi + p
    bp = s - hi
    e = (hi - (s - bp)) + (p - bp)
    return s, lo + e


def ozaki_matmul(a, b, q: int | None = None, beta: int = DEFAULT_BETA,
                 out_dtype=None, max_diag: int | None = None):
    """C = a @ b to ~2^-48 relative accuracy using bf16 MXU GEMMs only.

    ``a``/``b`` may be arrays (split here) or pre-split ``OzakiOperand``s
    (a as (m,k) with contract_axis=1, b as (k,n) with contract_axis=0).
    Returns the product in ``out_dtype`` (default: f64 when x64 is on).

    ``max_diag`` truncates the slice-pair expansion to ta+tb < max_diag,
    giving ~2^(-beta*max_diag) relative accuracy at ~max_diag^2/2 GEMMs —
    early Newton refinement steps only need gemm_err ~ err^2, so they run
    a cheap truncation (see refine.py's step schedule).
    """
    if q is None:
        q = _env_q()
    op_a = a if isinstance(a, OzakiOperand) else split_slices(a, 1, q, beta)
    op_b = b if isinstance(b, OzakiOperand) else split_slices(b, 0, q, beta)
    if op_a.beta != op_b.beta:
        raise ValueError(
            f"ozaki_matmul: operand slice widths differ "
            f"(beta {op_a.beta} vs {op_b.beta}) — the exact-accumulation "
            f"chunk bound 2^(22-2*beta) assumes one beta for both")
    beta = op_a.beta
    qa, qb = len(op_a.slices), len(op_b.slices)
    if max_diag is not None:
        qa, qb = min(qa, max_diag), min(qb, max_diag)
    k_dim = op_a.slices[0].shape[1]
    # f32 accumulation of (2*beta+2)-bit products is exact for chunks of
    # up to 2^(22-2*beta) terms; chunk the contraction beyond that.
    chunk = 1 << (22 - 2 * beta)
    m = op_a.slices[0].shape[0]
    n = op_b.slices[0].shape[1]
    hi = jnp.zeros((m, n), jnp.float32)
    lo = jnp.zeros((m, n), jnp.float32)
    # largest-magnitude diagonals first; pairs beyond ta+tb >= max(qa,qb)
    # are below 2^-(beta*q) of the leading term — skipped.
    for s_diag in range(max(qa, qb)):
        for ta in range(min(s_diag + 1, qa)):
            tb = s_diag - ta
            if tb >= qb:
                continue
            for k0 in range(0, k_dim, chunk):
                k1 = min(k0 + chunk, k_dim)
                p = lax.dot_general(
                    op_a.slices[ta][:, k0:k1], op_b.slices[tb][k0:k1, :],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                hi, lo = _two_sum_acc(hi, lo, p)
    if out_dtype is None:
        out_dtype = jnp.zeros((), jnp.float64).dtype
    c = hi.astype(out_dtype) + lo.astype(out_dtype)
    # undo the exact power-of-two row/col scalings (broadcast, no GEMM)
    return c * op_a.scale.astype(out_dtype) * op_b.scale.astype(out_dtype)
