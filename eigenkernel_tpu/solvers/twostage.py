"""Two-stage SEP core: full -> band -> tridiagonal (eigen_sx / ELPA2 analog).

Stage 1 (ops/band.py): all-GEMM full->band reduction, bandwidth = panel.
Stage 2 (ops/bulge.py): Householder bulge chasing on static windows,
O(n^2 bw) flops, no O(n^3) matvecs — the accelerator formulation that makes
two-stage the flagship (ELPA2 / eigen_sx role in the reference).

Eigenvector recovery composes both stages:
``z_A = Q_band (Q_chase z_T)`` — batched sweep rank-1s, then panel WY GEMMs.
"""

from __future__ import annotations

from functools import partial

import jax

from eigenkernel_tpu.ops import band as bandlib
from eigenkernel_tpu.ops import bulge as bulgelib


@partial(jax.jit, static_argnames=("bw", "mesh"))
def _j_to_band(a, bw, mesh):
    return bandlib.to_band(a, bw=bw, mesh=mesh)


@partial(jax.jit, static_argnames=("bw", "schedule", "mesh"))
def _j_band_to_tridiag(band, bw, schedule, mesh):
    # The chase is O(n^2 bw) window-local work that runs replicated (zero
    # communication) — but its replicated state is only the O(n*bw) banded
    # extraction, taken directly from the still-sharded dense band matrix
    # (bulge._to_banded); no O(n^2) array is ever replicated.
    return bulgelib.band_to_tridiag(band, bw=bw, schedule=schedule,
                                    mesh=mesh)


@partial(jax.jit, static_argnames=("bw", "mesh", "method"))
def _j_back_transform_two_stage(band_res, chase_res, z, bw, mesh, method):
    import os

    g = int(os.environ.get("EK_BT_GROUP", "0"))
    if method == "blocked" and mesh is not None:
        # column-sharded z + sweep-sharded reflector store: the chase
        # application distributes with zero replicated O(n^2) state
        z = bulgelib.apply_chase_q_blocked_sharded(chase_res, z, bw=bw,
                                                   group=g, mesh=mesh)
        return bandlib.apply_band_q(band_res, z, bw=bw, mesh=mesh)
    if mesh is not None:
        # non-blocked paths: chase application is row-window-local and
        # runs replicated; the subsequent stage-1 WY GEMMs re-shard.
        from jax.sharding import NamedSharding, PartitionSpec as P

        z = jax.lax.with_sharding_constraint(z, NamedSharding(mesh, P()))
    if method == "pallas":
        from eigenkernel_tpu.ops.pallas_backtransform import (
            apply_chase_q_pallas)
        z = apply_chase_q_pallas(chase_res.HV, chase_res.HT, z, bw=bw)
    elif method == "wavefront":
        # (column chunking for HBM headroom lives inside the op:
        # EK_BT_KCHUNK overrides the ~1 GB auto target)
        z = bulgelib.apply_chase_q_wavefront(chase_res, z, bw=bw, group=g)
    elif method == "wf_pallas":
        from eigenkernel_tpu.ops.pallas_wf_bt import (
            apply_chase_q_wavefront_pallas)
        z = apply_chase_q_wavefront_pallas(chase_res, z, bw=bw, group=g)
    elif method == "blocked":
        z = bulgelib.apply_chase_q_blocked(chase_res, z, bw=bw, group=g)
    else:
        z = bulgelib.apply_chase_q(chase_res, z, bw=bw, mesh=None)
    return bandlib.apply_band_q(band_res, z, bw=bw, mesh=mesh)


def sep_two_stage(ctx, a: jax.Array, n_vec: int):
    from eigenkernel_tpu.solvers.pipelines import _j_tridiag_eigh, _run

    import os

    from eigenkernel_tpu.obs import flops as fl

    n = a.shape[0]
    # the chase and to_band want different bandwidths: the chase's
    # per-step work is ~nW*bw^2 ~ n*bw/4 (smaller bw cheaper, and the
    # VMEM-resident pallas chase state is O(n*bw)), while to_band's HBM
    # traffic is ~n^3*4/bw bytes (bigger bw cheaper).  Measured on v5e
    # (evidence/): chase bw=32 beats 128 ~2x; to_band warm is subdominant
    # at bw>=32.  EK_TWOSTAGE_BW overrides; 0/unset = ctx.block_size.
    bw = int(os.environ.get("EK_TWOSTAGE_BW", "0")) or \
        (32 if (jax.default_backend() == "tpu" and ctx.mesh is None
                and n >= 2048 and n % 32 == 0) else ctx.block_size)
    if n % bw != 0:
        bw = ctx.block_size
    schedule = os.environ.get("EK_CHASE", "auto")
    if schedule == "auto":
        # measured on TPU v5e (all schedules gather-free): the VMEM-
        # resident pallas kernel removes the ~60-85 us XLA dispatch +
        # HBM round-trip every wavefront step pays, and its dispatcher
        # falls back to the XLA wavefront beyond VMEM capacity.  The
        # wavefront's 4n batched covering-slice steps in turn beat the
        # sequential chase's n^2/bw latency-bound windows once T = n/bw
        # is large (4096/bw64: wf 3.09s vs seq 3.43s; 4096/bw128: seq
        # 2.80s wins).  Single-device only: on a mesh the chunked
        # sequential path bounds the replicated in-flight reflector
        # state to n^2/chunks, which a wavefront scan-stacked store
        # would reintroduce.
        if (jax.default_backend() == "tpu" and ctx.mesh is None
                and n // bw >= 32):
            schedule = "pallas"   # falls back to wavefront2 beyond VMEM
        else:
            schedule = "sequential"
    band_res = _run(ctx, "sep:full_to_band", _j_to_band, a, bw, ctx.mesh,
                    flops=fl.full_to_band(n, bw))
    chunks = int(os.environ.get("EK_CHASE_CHUNKS",
                                "4" if ctx.mesh is not None else "1"))
    if schedule == "sequential" and chunks > 1:
        # host-staged chunks: bounds the replicated in-flight reflector
        # buffer to n^2/chunks (completed chunks persist sweep-sharded)
        chase = _run(ctx, "sep:band_to_tridiag",
                     bulgelib.band_to_tridiag_chunked,
                     band_res.band, bw, ctx.mesh, chunks,
                     flops=fl.band_to_tridiag(n, bw))
    else:
        chase = _run(ctx, "sep:band_to_tridiag", _j_band_to_tridiag,
                     band_res.band, bw, schedule, ctx.mesh,
                     flops=fl.band_to_tridiag(n, bw))
    # the dense band matrix (O(n^2)) is dead once the chase extracted its
    # banded state — drop it before the eigh/back-transform stages so the
    # peak HBM at n>=16384 stays clear of the stores + eigvec buffers
    # (observed RESOURCE_EXHAUSTED headroom at 16384 f32)
    band_res = band_res._replace(band=None)
    full = n_vec * 2 >= n
    w, z = _run(ctx, "sep:tridiag_eigh", _j_tridiag_eigh,
                chase.d, chase.e, n_vec, ctx.mesh,
                flops=fl.tridiag_dc(n) if full
                else fl.bisect_invit(n, n_vec))
    bt_method = os.environ.get("EK_BACKTRANSFORM", "auto")
    if bt_method == "auto":
        # WY-grouped sweeps (ELPA2-style, hardware-validated): the group
        # WAVEFRONT collapses nG*T sequential windows (~24 us each) to
        # T+nG batched covering-slice steps, and with g > bw (valid on
        # this schedule — op docstring) it beats the blocked loop at
        # full spectrum too (8192 f32: g=128 1.55 s vs blocked 1.91 s;
        # select-500/16k BT: 0.68 s vs ~6 s; evidence/
        # BT_WAVEFRONT_r3.md).  Meshes keep the sharded blocked
        # schedule; the VMEM-tile pallas kernel (wf_pallas) is opt-in
        # until hardware-validated.
        bt_method = "wavefront" if (jax.default_backend() == "tpu"
                                    and ctx.mesh is None) else "blocked"
        # VMEM-tile composite kernel (pallas_wf_bt v3), hardware-
        # validated r4 (evidence/WF_BT_r4.md): wins at full spectrum for
        # n>=8192 (8192: 1.49 s vs wavefront 1.55; 16384: 2.59 s vs
        # 12.0) — the XLA wavefront stays better at n<=4096 (wf_pallas
        # 1.87 s) and on the selecting path (k=500/16k: wavefront
        # 0.68 s; the P stream is O(n^2) regardless of k).  It falls
        # back to the XLA wavefront internally outside its envelope,
        # so routing is always safe.  EK_BT_WFP=1/0 forces/blocks it.
        wfp = os.environ.get("EK_BT_WFP")
        if bt_method == "wavefront" and (
                wfp == "1" or (wfp != "0" and n >= 8192
                               and 2 * n_vec >= n)):
            bt_method = "wf_pallas"
    z = _run(ctx, "sep:back_transform", _j_back_transform_two_stage,
             band_res, chase, z, bw, ctx.mesh, bt_method,
             flops=fl.back_transform_two_stage(n, n_vec))
    return w, z
