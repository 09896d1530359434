"""Top-level ``solve`` — the ``eigen_solver`` entry point (solver_main.f90:22).

Responsibilities, mirroring the reference's registry hub:

* dispatch ``-s`` name -> pipeline (select-case analog),
* mesh setup for non-single-device solvers (``setup_distribution`` analog),
* padding: matrix dims are padded to a multiple of the panel block and mesh
  axes so every blocked slice and device shard is static and equal-sized —
  the padding block of the standard matrix is "sentinelized" to sit above
  the spectrum, so the lowest eigenpairs are exactly the real ones,
* host->device placement with a 2D sharding (distribute/bcast analog),
* slicing the padded solution back to the logical dimension.
"""

from __future__ import annotations

import math
import sys
import time
from functools import partial
from typing import Any, Optional

# the bucketed split-s recursions (ops/band.py, ops/householder.py) are
# ~26 Python levels deep at n=2048/bw=32/split=8, and each level costs
# tens of tracer frames — the default 1000-frame limit blew up inside
# the mixed eigensx trace (r4 sweep: "maximum recursion depth exceeded")
sys.setrecursionlimit(max(sys.getrecursionlimit(), 20000))

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from eigenkernel_tpu.core.types import EigenPairs
from eigenkernel_tpu.obs.events import EventLog
from eigenkernel_tpu.parallel import mesh as meshlib
from eigenkernel_tpu.solvers import pipelines as pl
from eigenkernel_tpu.solvers.registry import (AUTO_NAMES, get_spec,
                                              resolve_auto)


@partial(jax.jit, static_argnames=("n_real", "n_pad", "eye", "sharding",
                                   "dtype"))
def _j_pad_device(x, n_real, n_pad, eye, sharding, dtype):
    """Pad an on-device matrix to (n_pad, n_pad) without a host round-trip.

    ``x`` may itself carry zero padding beyond the logical ``n_real``
    (e.g. the mesh-divisible pad of distribute_coo) — only the leading
    (n_real, n_real) block is kept.  ``eye=True`` puts ones on the padding
    diagonal (B-matrix padding)."""
    keep = x[:n_real, :n_real] if x.shape[0] > n_real else x
    out = jnp.zeros((n_pad, n_pad), dtype)
    out = jax.lax.dynamic_update_slice(out, keep.astype(dtype), (0, 0))
    if eye and n_pad > n_real:
        idx = jnp.arange(n_pad)
        out = out + jnp.diag((idx >= n_real).astype(dtype))
    if sharding is not None:
        out = jax.lax.with_sharding_constraint(out, sharding)
    return out


def _pad_place(x, n: int, n_pad: int, dtype, sharding, eye: bool):
    """Pad + place one operand. Device inputs are padded on device (zero
    O(n^2) device<->host traffic — the reference's rank-0-read+bcast path
    only applies to host inputs); host inputs are padded in numpy then
    transferred once."""
    if isinstance(x, jax.Array):
        if (x.shape == (n_pad, n_pad) and x.dtype == np.dtype(dtype)
                and sharding is None):
            # already the exact padded form: returning the caller's array
            # avoids a second device copy (2 GB of f64 at n=16384 — the
            # margin between fitting and a runtime OOM in mixed 16k)
            return x
        return _j_pad_device(x, n_real=n, n_pad=n_pad, eye=eye,
                             sharding=sharding, dtype=dtype)
    x_host = np.asarray(x, dtype=dtype)
    pad = np.zeros((n_pad, n_pad), dtype=dtype)
    pad[:n, :n] = x_host
    if eye:
        for i in range(n, n_pad):
            pad[i, i] = 1.0
    return jax.device_put(pad, sharding)


def _pick_gemm_block(n_pad: int, panel: int, target: int = 256) -> int:
    """Largest multiple of ``panel`` dividing ``n_pad``, at most ~target."""
    best = panel
    k = 1
    while True:
        cand = panel * (k + 1)
        if cand > target or (n_pad % cand) != 0:
            break
        k += 1
        best = cand
    return min(best, n_pad)


def solve(a: Any, b: Any = None, solver: str = "general_elpa2",
          n_vec: Optional[int] = None, mesh: Optional[Mesh] = None,
          block_size: int = 0, log: Optional[EventLog] = None,
          dtype: Any = None, n_logical: Optional[int] = None) -> EigenPairs:
    """Solve ``A x = lambda x`` or ``A x = lambda B x`` (B SPD).

    ``a``/``b`` are host (or device) dense symmetric matrices.  Device
    inputs may carry zero padding beyond ``n_logical`` rows/cols (e.g.
    from :func:`eigenkernel_tpu.parallel.mesh.distribute_coo`).  Returns
    eigenvalues ascending and eigenvectors in columns; for generalized
    problems the vectors are B-orthonormal (dsygv convention).
    """
    if solver in AUTO_NAMES:
        _n = int(n_logical if n_logical is not None else a.shape[0])
        solver = resolve_auto(solver, _n, generalized=b is not None,
                              selecting=n_vec is not None and n_vec != _n,
                              on_mesh=mesh is not None,
                              backend=jax.default_backend())
    spec = get_spec(solver)
    if spec.generalized != (b is not None):
        kind = "generalized" if b is not None else "standard"
        raise ValueError(f"solver '{solver}' is not for {kind} problems")
    n = int(n_logical if n_logical is not None else a.shape[0])
    if not spec.selecting and n_vec is not None and n_vec != n:
        raise ValueError(
            f"solver '{solver}' does not support partial computation")

    if a.shape[0] != a.shape[1] or (b is not None and b.shape != a.shape):
        raise ValueError("matrix dimension mismatch")
    n_vec = n if n_vec is None else int(n_vec)
    mixed = dtype == "mixed"
    if mixed:
        # mixed precision: fast f32 pipeline + f64 Newton refinement
        # (ops/refine.py) — f64 is software-emulated on TPU, so only the
        # three refinement GEMMs pay the f64 cost.
        if jnp.zeros((), jnp.float64).dtype != jnp.dtype(jnp.float64):
            raise ValueError(
                "dtype='mixed' requires jax_enable_x64=True; without it the "
                "f64 refinement operands silently downcast to f32 and the "
                "Newton refinement is a no-op")
        dtype = jnp.float32
    dtype = dtype or (a.dtype if hasattr(a, "dtype") and
                      np.dtype(a.dtype).kind == "f" else jnp.float64)

    panel = block_size if block_size > 0 else pl.DEFAULT_PANEL

    if spec.single_device or spec.core == "eigh" and mesh is None:
        mesh = None
    ctx_mesh = mesh
    grid = mesh if mesh is not None else meshlib.single_device_mesh()
    panel = min(panel, max(8, 1 << (n - 1).bit_length()))  # don't over-pad tiny n
    n_pad = meshlib.padded_dim(n, grid, panel)
    # EK_FORCE_NPAD: pad the working dimension up to (at least) the given
    # value.  Diagnostic / platform-wall workaround knob: on the tunneled
    # v5e worker, programs whose dominant (n_pad, n_pad) f32 buffer is
    # exactly 2^32 bytes (n_pad = 32768) hard-crash the worker mid-sytrd
    # while 28672 passes (evidence/SWEEP_r5.md chains L/N/O/Q) — padding
    # one panel past the 4 GiB line changes every buffer size without
    # changing the logical problem (sentinel padding keeps the lowest
    # n_real eigenpairs exact).
    import os as _os
    _force = int(_os.environ.get("EK_FORCE_NPAD", "0"))
    if _force > n_pad:
        n_pad = meshlib.padded_dim(_force, grid, panel)
    gemm_block = _pick_gemm_block(n_pad, panel)

    ctx = pl.SolverContext(mesh=ctx_mesh, block_size=panel,
                           gemm_block=gemm_block, log=log)

    # Selecting solvers (pdsyevx analog) default to the two-stage SEP core
    # on TPU at scale: the partial-spectrum path otherwise inherits the
    # full HBM-bound one-stage tridiagonalization, which dominates
    # (measured: lowest-500 of 16k spent 10.5 of 10.5 s there).  The
    # two-stage reduction is GEMM-rich and the back-transform only touches
    # the selected k columns.  EK_SELECT_CORE=one_stage|two_stage pins it.
    core = spec.core
    if spec.selecting and core == "one_stage":
        import os

        sel = os.environ.get("EK_SELECT_CORE", "auto")
        if sel == "auto":
            # 2048..16384 is the hardware-validated two-stage domain;
            # beyond it the chase-store repack holds both O(n^2) layouts
            # live (~17.4 GB at 32k, evidence/BUDGET_32K_r5.md) — the
            # one-stage core (staged sytrd above 28672) fits instead
            if jax.default_backend() == "tpu" and 2048 <= n <= 16384:
                core = "two_stage"
        elif sel in ("one_stage", "two_stage"):
            core = sel

    # --- pad + place (distribute_global_sparse_matrix / bcast analog)
    np_dtype = np.dtype(dtype)
    sharding = meshlib.mat_sharding(mesh) if mesh is not None else None
    a_dev = _pad_place(a, n, n_pad, np_dtype, sharding, eye=False)

    if b is None:
        w, z = pl.standard_pipeline(ctx, a_dev, n_vec, n, core,
                                    owned=a_dev is not a)
    else:
        b_dev = _pad_place(b, n, n_pad, np_dtype, sharding, eye=True)
        w, z = pl.generalized_pipeline(ctx, a_dev, b_dev, n_vec, n,
                                       core, spec.reduction)

    values = w[:n_vec]
    vectors = z[:n, :n_vec]

    if mixed:
        # Refine against the ORIGINAL full-precision operands, not the
        # f32-rounded pipeline copies; padded back to n_pad so the 2D mesh
        # sharding stays valid (V's zero pad rows are invariant under the
        # Newton update, so the padded refinement equals the unpadded one).
        t0 = time.time()
        f64 = np.dtype(np.float64)
        a64 = _pad_place(a, n, n_pad, f64, sharding, eye=False)
        b64 = _pad_place(b, n, n_pad, f64, sharding, eye=True) \
            if b is not None else None
        from eigenkernel_tpu.ops.refine import refine_stepwise, use_stepwise
        from eigenkernel_tpu.obs.mem import memstats
        stepwise = use_stepwise(n_pad)
        # stepwise path: pad straight into f64 (it refines in f64 anyway)
        # so the f32 eigenvector buffer can be freed here instead of
        # staying caller-held across every refinement jit — XLA's memory
        # plan never sees caller-held arrays, so each GB shaved here is
        # a GB of real runtime headroom (the r5 16k runtime OOM happened
        # with a plan that "fit")
        v_pad = jnp.zeros((n_pad, n_vec),
                          np.float64 if stepwise else vectors.dtype) \
            .at[:n, :].set(vectors)
        # the f32 pipeline buffers (a_dev, z and its vectors view) are
        # dead from here on but would otherwise stay device-resident
        # across the refinement jits — ~3 GB at n=16384, on top of a
        # compile-time HBM plan that fits with ~1 GB to spare (r5)
        del a_dev, vectors, w, z
        if b is not None:
            del b_dev
        memstats("solve:pre_refine")
        with jax.default_matmul_precision("highest"):
            if stepwise:
                # huge-n TPU path: host-level step loop with donated v —
                # one whole-refinement jit planned 74 GB HBM at n=16384
                values, v_pad = refine_stepwise(a64, v_pad, b64, ctx_mesh)
            else:
                values, v_pad = _j_refine(a64, v_pad, b64, ctx_mesh)
        vectors = v_pad[:n, :]
        ctx.tick("solve:refine", t0, (values, vectors))

    return EigenPairs(values=values, vectors=vectors,
                      sharded=ctx_mesh is not None,
                      meta={"solver": solver, "n_pad": n_pad,
                            "panel": panel, "gemm_block": gemm_block})


@partial(jax.jit, static_argnames=("mesh",))
def _j_refine(a64, v, b64, mesh):
    from eigenkernel_tpu.ops.refine import refine_eigenpairs

    return refine_eigenpairs(a64, v, b=b64, mesh=mesh)


def fused_solver(solver: str, n: int, n_vec: Optional[int] = None,
                 mesh: Optional[Mesh] = None, block_size: int = 0):
    """Build one fully-jittable function for a named pipeline.

    The returned ``fn(a[, b]) -> (values, vectors)`` contains the whole
    solve as a single traceable computation (no host sync, no event log) —
    used by bench.py and ``__graft_entry__`` to compile the flagship path
    end-to-end.  ``n`` must already be divisible by the panel block and the
    mesh axes (no padding happens here).
    """
    if solver in AUTO_NAMES:
        solver = resolve_auto(solver, n, generalized=solver.startswith("g"),
                              selecting=n_vec is not None and n_vec != n,
                              on_mesh=mesh is not None,
                              backend=jax.default_backend())
    spec = get_spec(solver)
    if spec.core == "qdwh":
        raise ValueError(
            f"solver '{solver}' (QDWH spectral D&C) runs host-staged "
            "recursion with data-dependent splits and cannot be fused "
            "into one jittable computation — use solve() instead")
    panel = block_size if block_size > 0 else pl.DEFAULT_PANEL
    panel = min(panel, n)
    if n % panel != 0:
        raise ValueError(f"n={n} must be divisible by panel {panel}")
    gemm_block = _pick_gemm_block(n, panel)
    k = n if n_vec is None else int(n_vec)
    ctx = pl.SolverContext(mesh=mesh, block_size=panel,
                           gemm_block=gemm_block, log=None)

    if spec.generalized:
        def fn(a, b):
            return pl.generalized_pipeline(ctx, a, b, k, n, spec.core,
                                           spec.reduction)
    else:
        def fn(a):
            return pl.standard_pipeline(ctx, a, k, n, spec.core)
    return fn
