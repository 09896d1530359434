"""Solver pipelines: reduction strategy x SEP core x back-transform.

The reference's product shape is a *zoo of hybrid pipelines* behind one
registry (solver_main.f90:52-99): each ``-s`` name picks a combination of
ScaLAPACK / ELPA / EigenExa routines.  Here every named solver is a
composition of this module's stage functions, all TPU-native:

  reduction:  'scalapack' = Cholesky + trsm       (pdpotrf+pdsygst analog)
              'elpa'      = Cholesky + explicit inverse + GEMMs
                                                  (ELPA reduction analog)
  SEP core:   'one_stage' = blocked Householder tridiagonalization
                            + bisection/inverse-iteration tridiagonal solve
                            + compact-WY back-transform
                            (pdsytrd/pdstedc/pdormtr, eigen_s, ELPA1 analogs)
              'two_stage' = full->band + band->tridiagonal
                            (eigen_sx / ELPA2 analog, ops/band.py)
              'eigh'      = XLA's built-in QDWH eigensolver (TPU extra)
  recovery:   trsm (pdtrtrs analog) or GEMM with the stored inverse factor
              (pdtrmm analog), matching the reduction style.

Each stage runs as its own cached-jit computation; when the context carries
an :class:`EventLog` the driver blocks between stages and records the
reference's hierarchical event names, so ``log.json`` phase timings are
comparable with EigenKernel's.  With ``log=None`` the same code path is
fully traceable — ``fused_solver`` jits a whole pipeline into one XLA
computation (used by bench/dryrun).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from eigenkernel_tpu.obs.events import EventLog
from eigenkernel_tpu.ops import blocked, householder, reduction as red
from eigenkernel_tpu.ops import tridiag as td

DEFAULT_PANEL = 64      # Householder panel width (reference g_block_size=64)
DEFAULT_GEMM_BLOCK = 256  # blocked-BLAS tile for cholesky/trsm/inverse


@dataclass
class SolverContext:
    mesh: Optional[Mesh] = None
    block_size: int = DEFAULT_PANEL
    gemm_block: int = DEFAULT_GEMM_BLOCK
    log: Optional[EventLog] = None

    def tick(self, name: str, t0: float, out: Any,
             flops: Optional[float] = None) -> None:
        if self.log is not None:
            # Dependent-scalar sync: on the tunneled TPU backend
            # block_until_ready returns before the program drains, so
            # stage times were misattributed to whichever stage fetched
            # next (RESULTS_r3.md session 8; exp24 methodology).  A
            # scalar computed FROM the output cannot be fetched before
            # the producing program finishes, so this is the trusted
            # stage barrier on every backend.
            for leaf in jax.tree_util.tree_leaves(out):
                if isinstance(leaf, jax.Array) and leaf.size:
                    # slice ONE element per axis first — jnp.ravel on the
                    # whole leaf materializes a full O(n^2) device copy
                    # before the slice (extra HBM traffic charged to the
                    # timed stage, r4 ADVICE)
                    one = leaf[(slice(0, 1),) * leaf.ndim]
                    float(jnp.sum(one))
            jax.block_until_ready(out)
            dt = time.time() - t0
            self.log.add_event(name, dt)
            from eigenkernel_tpu.obs.mem import memstats
            memstats(f"tick:{name}")
            if flops and dt > 0:
                # backend GFLOPS self-report analog (the reference re-logs
                # EigenExa's '!'-prefixed Gflops timer entries,
                # solver_eigenexa.f90:120-131); model flops, see obs/flops
                self.log.add_event(f"!{name}_Gflops", flops / dt / 1e9)


def _run(ctx: SolverContext, name: str, fn: Callable, *args,
         flops: Optional[float] = None) -> Any:
    t0 = time.time()
    with jax.default_matmul_precision("highest"):
        out = fn(*args)
    ctx.tick(name, t0, out, flops=flops)
    return out


# ----------------------------------------------------------------------
# cached jitted op wrappers (mesh/blocks static => one compile per config)
# ----------------------------------------------------------------------

@partial(jax.jit, static_argnames=("block", "mesh"))
def _j_reduce_scalapack(a, b, block, mesh):
    r = red.reduce_scalapack(a, b, block=block, mesh=mesh)
    return r.a_std, r.factor


@partial(jax.jit, static_argnames=("block", "mesh"))
def _j_reduce_scalapack_new(a, b, block, mesh):
    r = red.reduce_scalapack_new(a, b, block=block, mesh=mesh)
    return r.a_std, r.factor


@partial(jax.jit, static_argnames=("block", "mesh"))
def _j_reduce_elpa(a, b, block, mesh):
    r = red.reduce_elpa(a, b, block=block, mesh=mesh)
    return r.a_std, r.factor


@partial(jax.jit, static_argnames=("block", "mesh", "style"))
def _j_recover(factor, style, y, block, mesh):
    return red.recover(red.Reduction(None, factor, style), y, block=block,
                       mesh=mesh)


@partial(jax.jit, static_argnames=("block", "mesh"))
def _j_tridiagonalize(a, block, mesh):
    return householder.tridiagonalize(a, block=block, mesh=mesh)


@partial(jax.jit, static_argnames=("block", "mesh"), donate_argnums=(0,))
def _j_tridiagonalize_donated(a, block, mesh):
    # donating `a` lets XLA reuse its buffer as the panel-loop carry
    # instead of copying it — 4 GB of the selecting-32k HBM budget
    # (evidence/BUDGET_32K_r5.md).  Selected when the input is an
    # internal copy (sentinel-padded) or under EK_SYTRD_DONATE=1
    # (caller's array is DESTROYED).
    return householder.tridiagonalize(a, block=block, mesh=mesh)


@partial(jax.jit, static_argnames=("n_vec", "mesh"))
def _j_tridiag_eigh(d, e, n_vec, mesh):
    return td.tridiag_eigh(d, e, n_vec=n_vec, mesh=mesh)


@partial(jax.jit, static_argnames=("block", "mesh"))
def _j_apply_q(tri, z, block, mesh):
    return householder.apply_q(tri, z, block=block, mesh=mesh)


@jax.jit
def _j_eigh(a):
    return jnp.linalg.eigh(a)


def _sentinelize_impl(a, n_real):
    """Set the padding diagonal of ``a`` to a value strictly above the
    spectrum of the leading ``n_real`` block (Gershgorin), so padded
    eigenpairs sort last and the lowest n_real eigenpairs are the real ones.
    """
    n = a.shape[0]
    if n == n_real:
        return a
    mu = blocked.gershgorin_sentinel(a[:n_real, :n_real])
    idx = jnp.arange(n)
    pad_mask = idx >= n_real
    diag_new = jnp.where(pad_mask, mu, jnp.diag(a))
    return a - jnp.diag(jnp.diag(a)) + jnp.diag(diag_new)


_j_sentinelize = partial(jax.jit, static_argnames=("n_real",))(
    _sentinelize_impl)
# donated variant for pipeline-owned inputs: without donation the
# pre-sentinel padded copy stays live (caller-held in solve's frame)
# through the whole core — at n_pad=32832 f32 that extra 4.3 GB put the
# padded selecting-32k run past HBM (r5 chain-S runtime OOM)
_j_sentinelize_donated = partial(jax.jit, static_argnames=("n_real",),
                                 donate_argnums=(0,))(_sentinelize_impl)


# ----------------------------------------------------------------------
# SEP cores on the (padded) standard problem
# ----------------------------------------------------------------------

def sep_one_stage(ctx: SolverContext, a: jax.Array, n_vec: int,
                  n_real: Optional[int] = None):
    """pdsytrd + tridiagonal-solve + pdormtr analog (see module doc)."""
    from eigenkernel_tpu.obs import flops as fl

    import os

    n = a.shape[0]
    # a sentinel-padded input (n_real < n) is an internal copy the
    # pipeline never reads again — donate it; a caller-owned buffer is
    # only donated on explicit request (EK_SYTRD_DONATE=1 destroys it)
    donate = (n_real is not None and n_real != n) \
        or os.environ.get("EK_SYTRD_DONATE") == "1"
    # the one-program bucketed sytrd hard-crashes the tunneled v5e worker
    # for n > 28672 (passes at 28672, four clean crash repros at
    # 32640/32768/32832) while the identical per-panel computation runs
    # fine as its own executable — route huge n through the host-stepped
    # uniform schedule (evidence/SWEEP_r5.md chains L/N/O/S/T).
    staged_env = os.environ.get("EK_SYTRD_STAGED", "auto")
    staged = staged_env == "1" or (
        staged_env == "auto" and jax.default_backend() == "tpu"
        and n > int(os.environ.get("EK_SYTRD_STAGED_MIN", "28672")))
    if staged:
        tri = _run(ctx, "sep:tridiagonalize",
                   lambda a_, blk, msh: householder.tridiagonalize_staged(
                       a_, block=blk, mesh=msh, donate_ok=donate),
                   a, ctx.block_size, ctx.mesh, flops=fl.tridiagonalize(n))
    else:
        tri_fn = _j_tridiagonalize_donated if donate else _j_tridiagonalize
        tri = _run(ctx, "sep:tridiagonalize", tri_fn,
                   a, ctx.block_size, ctx.mesh, flops=fl.tridiagonalize(n))
    full = n_vec * 2 >= n
    w, z = _run(ctx, "sep:tridiag_eigh", _j_tridiag_eigh,
                tri.d, tri.e, n_vec, ctx.mesh,
                flops=fl.tridiag_dc(n) if full
                else fl.bisect_invit(n, n_vec))
    z = _run(ctx, "sep:back_transform", _j_apply_q,
             tri, z, ctx.block_size, ctx.mesh,
             flops=fl.back_transform_one_stage(n, n_vec))
    return w, z


def sep_two_stage(ctx: SolverContext, a: jax.Array, n_vec: int,
                  n_real: Optional[int] = None):
    """eigen_sx / ELPA2 analog: full->band, band->tridiag, then solve."""
    from eigenkernel_tpu.solvers.twostage import sep_two_stage as impl
    return impl(ctx, a, n_vec)


def sep_eigh(ctx: SolverContext, a: jax.Array, n_vec: int,
             n_real: Optional[int] = None):
    """XLA QDWH-eig (the library baseline; single-shot jit)."""
    from eigenkernel_tpu.obs import flops as fl

    w, z = _run(ctx, "sep:eigh", _j_eigh, a, flops=fl.eigh(a.shape[0]))
    return w[:n_vec], z[:, :n_vec]


@partial(jax.jit, static_argnames=("block", "mesh"))
def _j_jacobi(a, block, mesh):
    from eigenkernel_tpu.ops.jacobi import block_jacobi_eigh

    return block_jacobi_eigh(a, block=block, mesh=mesh)


def sep_jacobi(ctx: SolverContext, a: jax.Array, n_vec: int,
               n_real: Optional[int] = None):
    """Block-Jacobi core (TPU extra family, ops/jacobi.py): no sequential
    panel recurrence at all — batched pair eigh + full-width GEMMs."""
    from eigenkernel_tpu.obs import flops as fl

    w, z = _run(ctx, "sep:jacobi", _j_jacobi, a, ctx.block_size, ctx.mesh,
                flops=fl.jacobi(a.shape[0]))
    return w[:n_vec], z[:, :n_vec]


def sep_qdwh(ctx: SolverContext, a: jax.Array, n_vec: int,
             n_real: Optional[int] = None):
    """QDWH spectral divide-and-conquer core (TPU extra family,
    ops/qdwh.py): host-level recursion over bucketed static-shape jits —
    not fusable into one jit, so it runs only on the staged solve() path."""
    from eigenkernel_tpu.obs import flops as fl
    from eigenkernel_tpu.ops.qdwh import spectral_dc_eigh

    def run(x):
        return spectral_dc_eigh(x, n_real=n_real, block=ctx.gemm_block,
                                mesh=ctx.mesh)

    w, z = _run(ctx, "sep:qdwh_dc", run, a, flops=fl.qdwh_dc(a.shape[0]))
    return w[:n_vec], z[:, :n_vec]


SEP_CORES = {
    "one_stage": sep_one_stage,
    "two_stage": sep_two_stage,
    "eigh": sep_eigh,
    "jacobi": sep_jacobi,
    "qdwh": sep_qdwh,
}


# ----------------------------------------------------------------------
# pipelines
# ----------------------------------------------------------------------

def standard_pipeline(ctx: SolverContext, a: jax.Array, n_vec: int,
                      n_real: int, core: str, owned: bool = False):
    """Standard EVP: sentinel-pad, run the SEP core, slice real rows.

    ``owned=True`` means ``a`` is a pipeline-internal copy (solve's
    _pad_place made it) — the sentinelize jit then donates it, so the
    pre-sentinel buffer is reused instead of staying caller-held through
    the core (4.3 GB at n_pad=32832, the r5 chain-S OOM margin)."""
    if n_real != a.shape[0]:
        # only when padding exists: an identity jit (n_real == n) still
        # copies its 4.3 GB input at n=32768 — and the copy, the caller's
        # buffer, and the reflector store together overflow HBM (r5
        # chain-J runtime OOM during the 32k tridiagonalize)
        a = (_j_sentinelize_donated if owned else _j_sentinelize)(a, n_real)
    w, z = SEP_CORES[core](ctx, a, n_vec, n_real=n_real)
    return w, z


def generalized_pipeline(ctx: SolverContext, a: jax.Array, b: jax.Array,
                         n_vec: int, n_real: int, core: str,
                         reduction_style: str):
    """Generalized EVP: reduce, sentinel-pad, SEP core, recover."""
    from eigenkernel_tpu.obs import flops as fl

    n = a.shape[0]
    if reduction_style == "elpa":
        a_std, factor = _run(ctx, "solve:reduce_elpa", _j_reduce_elpa,
                             a, b, ctx.gemm_block, ctx.mesh,
                             flops=fl.reduce_elpa(n))
    elif reduction_style == "scalapack_new":
        a_std, factor = _run(ctx, "reduce_generalized_new",
                             _j_reduce_scalapack_new,
                             a, b, ctx.gemm_block, ctx.mesh,
                             flops=fl.reduce_scalapack(n))
    else:
        a_std, factor = _run(ctx, "reduce_generalized", _j_reduce_scalapack,
                             a, b, ctx.gemm_block, ctx.mesh,
                             flops=fl.reduce_scalapack(n))
    if n_real != a_std.shape[0]:  # identity jit still copies (see above)
        # a_std is always the reduction jit's own output — donate it
        a_std = _j_sentinelize_donated(a_std, n_real)
    w, z = SEP_CORES[core](ctx, a_std, n_vec, n_real=n_real)
    recover_style = "elpa" if reduction_style == "elpa" else "scalapack"
    x = _run(ctx, "recovery_generalized", _j_recover,
             factor, recover_style, z, ctx.gemm_block, ctx.mesh,
             flops=fl.recover(n, n_vec))
    # x = L^{-T} z is automatically B-orthonormal (x^T B x = z^T z = I),
    # the dsygv/reference normalization convention — do not renormalize.
    return w, x
