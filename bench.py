"""Benchmark driver: one JSON line for the round harness.

Headline metric: time-to-solution of the standard symmetric EVP at
M=EK_BENCH_N (default 4096, f32) on the local chip with our staged
pipeline, against XLA's built-in QDWH ``jnp.linalg.eigh`` on the same
matrix/precision — the strongest existing TPU eigensolver available to a
user today (the reference itself publishes no numbers, BASELINE.md).

vs_baseline = t_eigh / t_ours  (>1 means we beat XLA's eigh).

One default run additionally measures and embeds (rec["extra"]):
  * mixed precision at the headline M — the BASELINE.md residual bar
    (<=1e-12) at f32-pipeline speed (Ozaki bf16-slice refinement GEMMs);
  * the generalized EVP at M=4096 (BASELINE.json's metric);
  * the full-spectrum M=16384 row (the scale point; XLA eigh cannot
    compile there on this setup).
EK_BENCH_QUICK=1 skips the extras; EK_BENCH_FULL=1 adds the selecting
lowest-500/16k config.

Implementation notes for this environment:
* the staged path is used (each stage is its own cached-jit computation) —
  one fully-fused program hits pathological remote-compile times;
* ``block_until_ready`` does not synchronize through the TPU tunnel, so
  every timed region ends with a dependent scalar fetch (SolverContext.tick
  stage times use the same barrier, so stages={} is trusted);
* the persistent compilation cache (.jax_cache) makes reruns fast.

Env knobs: EK_BENCH_N, EK_BENCH_DTYPE (float32|float64|mixed),
EK_BENCH_SOLVER, EK_BENCH_BLOCK, EK_BENCH_NVEC, EK_BENCH_QUICK,
EK_BENCH_FULL, EK_BENCH_LOG.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _sync_scalar(x) -> float:
    """Relay-safe device sync: fetch a dependent scalar."""
    import jax.numpy as jnp

    return float(jnp.sum(x))


def _sym(n: int, dtype: str, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((n, n))
    return ((a + a.T) / 2).astype(dtype)


def _spd(n: int, dtype: str, seed: int = 1) -> np.ndarray:
    rng = np.random.default_rng(seed)
    l = (rng.standard_normal((n, n)) * 0.1).astype(dtype)
    return (l @ l.T + n * np.eye(n, dtype=dtype)).astype(dtype)


def _measure(solve, ad, bd=None, *, repeats=3, log=None, **solve_kw):
    """Warm-timed solve (min over repeats) + f64-checked quality."""
    import jax
    import jax.numpy as jnp

    args = (ad,) if bd is None else (ad, bd)
    t0 = time.time()
    # warm up WITH a throwaway log: the tick barrier compiles one tiny
    # dependent-scalar program per stage-output shape, and on the remote
    # TPU those compiles cost seconds — without this they land inside
    # the logged timed run and get misattributed to stages (r4e bench:
    # "tridiagonalize 2.20 s" inside a 0.25 s solve, skewing hbm_frac)
    if log is not None:
        from eigenkernel_tpu.obs.events import EventLog

        p = solve(*args, log=EventLog(stream=False), **solve_kw)
    else:
        p = solve(*args, **solve_kw)
    _sync_scalar(p.values)
    compile_s = time.time() - t0
    times = []
    for i in range(repeats):
        t0 = time.time()
        p = solve(*args, log=log if i == repeats - 1 else None, **solve_kw)
        _sync_scalar(p.values + p.vectors[0, :])
        times.append(time.time() - t0)

    @jax.jit
    def quality(w, v, ad, bd):
        k = w.shape[0]
        with jax.default_matmul_precision("highest"):
            vv = v.astype(ad.dtype)
            bv = vv if bd is None else bd @ vv
            r = ad @ vv - bv * w[None, :].astype(ad.dtype)
            return (jnp.max(jnp.abs(r)) / jnp.linalg.norm(ad),
                    jnp.max(jnp.abs(vv.T @ bv
                                    - jnp.eye(k, dtype=ad.dtype))))

    # huge-n f64 checks (the mixed_m16384 row): the full-width check's
    # emulated-f64 GEMM temps overflow HBM next to the held f64 operands
    # — check a spectrum-spanning strided 1024-column subset instead
    # (max over the subset; same semantics, bounded temps)
    w_chk, v_chk = p.values, p.vectors
    if (np.dtype(ad.dtype) == np.float64 and ad.shape[0] >= 8192
            and w_chk.shape[0] > 1024):
        stride = -(-w_chk.shape[0] // 1024)
        w_chk, v_chk = w_chk[::stride], v_chk[:, ::stride]
    resid, orth = quality(w_chk, v_chk, ad, bd)
    return p, min(times), compile_s, _sync_scalar(resid), _sync_scalar(orth)


def main() -> None:
    n = int(os.environ.get("EK_BENCH_N", "4096"))
    dtype_name = os.environ.get("EK_BENCH_DTYPE", "float32")
    solver = os.environ.get("EK_BENCH_SOLVER", "scalapack")
    block = int(os.environ.get("EK_BENCH_BLOCK", "128"))
    n_vec = int(os.environ.get("EK_BENCH_NVEC", "0")) or None  # selecting

    import jax

    plat = os.environ.get("EK_PLATFORM")
    if plat:
        # sitecustomize force-selects the axon TPU plugin; env JAX_PLATFORMS
        # does not override it — the config call does (CPU smoke tests)
        jax.config.update("jax_platforms", plat)

    cache_dir = os.environ.get("EK_CACHE_DIR",
                               os.path.join(os.path.dirname(
                                   os.path.abspath(__file__)), ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    # mixed: f32 pipeline + f64 Newton refinement (ops/refine.py) — reaches
    # f64-level residuals while only the refinement GEMMs (Ozaki bf16-slice
    # on TPU) pay the emulated-f64 cost.  x64 ONLY for those configs: under
    # x64 the f32 headline traces a different program (int64 index math,
    # weak-f64 constants) than what f32 library users run (r4 ADVICE).
    if dtype_name in ("float64", "mixed"):
        jax.config.update("jax_enable_x64", True)

    # Probe the backend with a BOUNDED subprocess first: a wedged axon
    # relay makes in-process jax.devices() block ~25 min before failing
    # UNAVAILABLE (observed repeatedly in rounds 1-2).  The subprocess
    # probe times out safely (nothing is in flight server-side when the
    # relay is down), and the round records an honest, labeled CPU
    # number instead of rc=1.
    if not plat:
        import subprocess
        probe_t = int(os.environ.get("EK_TPU_PROBE_TIMEOUT", "900"))
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print(jax.devices()[0].platform)"],
                timeout=probe_t, capture_output=True, text=True)
            ok = r.returncode == 0
        except subprocess.TimeoutExpired:
            ok = False
        if not ok:
            print("# TPU probe failed/timed out; falling back to cpu",
                  file=sys.stderr)
            jax.config.update("jax_platforms", "cpu")
    try:
        platform = jax.devices()[0].platform
    except RuntimeError as exc:
        print(f"# backend unavailable ({exc!r}); falling back to cpu",
              file=sys.stderr)
        jax.config.update("jax_platforms", "cpu")
        platform = jax.devices()[0].platform
    import jax.numpy as jnp

    from eigenkernel_tpu.obs.events import EventLog
    from eigenkernel_tpu.solvers.api import solve

    mixed = dtype_name == "mixed"
    a = _sym(n, "float64" if mixed else dtype_name)
    ad = jnp.asarray(a)
    solve_kw = dict(solver=solver, block_size=block, n_vec=n_vec)
    if mixed:
        solve_kw["dtype"] = "mixed"

    # --- ours (staged; first call compiles each stage, cached on disk)
    log = EventLog(stream=False)
    p, t_ours, compile_s, resid, orth = _measure(solve, ad, log=log,
                                                 **solve_kw)
    stage_times = {e["name"]: round(e["val"], 4) for e in log.events()}

    log_path = os.environ.get("EK_BENCH_LOG")
    if log_path:
        # reference-schema log.json evidence of the measured run
        from eigenkernel_tpu.io.outputs import write_log_json
        write_log_json(log_path, {
            "command": "bench.py", "dim": n, "dtype": dtype_name,
            "solver_type": solver, "block_size": block,
            "platform": platform,
            "device_kind": jax.devices()[0].device_kind,
        }, log)

    # model flops -> TFLOP/s and fraction of chip peak (BASELINE.md asks
    # for >40% of matmul peak at scale; EigenExa self-reports GFLOPS)
    from eigenkernel_tpu.obs import flops as fl
    from eigenkernel_tpu.solvers.registry import get_spec

    spec = get_spec(solver)
    n_pad = p.meta["n_pad"]
    k = n_vec or n
    model_fl = fl.pipeline_flops(spec.core, spec.generalized,
                                 spec.reduction, n_pad, k, block)
    tflops = model_fl / t_ours / 1e12
    peak = fl.chip_peak_flops(jax.devices()[0].device_kind, dtype_name)
    mfu = (model_fl / t_ours / peak) if peak else None

    # roofline fraction of HBM speed-of-light for the memory-bound
    # reduction stages (MFU understates a memory-bound solver)
    hbm_frac = None
    bw_peak = fl.chip_hbm_bw(jax.devices()[0].device_kind)
    isize = 8 if dtype_name == "float64" else 4  # mixed pipeline is f32
    t_tri = stage_times.get("sep:tridiagonalize")
    if t_tri and bw_peak and spec.core == "one_stage":
        from eigenkernel_tpu.ops.householder import DEFAULT_SYTRD_SPLIT
        split = int(os.environ.get("EK_SYTRD_SPLIT",
                                   str(DEFAULT_SYTRD_SPLIT)))
        bytes_model = fl.sytrd_bytes(n_pad, split, isize)
        hbm_frac = round(bytes_model / t_tri / bw_peak, 3)
    t_band = stage_times.get("sep:full_to_band")
    if t_band and bw_peak and spec.core == "two_stage":
        bw_band = int(os.environ.get("EK_TWOSTAGE_BW", "32"))
        hbm_frac = round(fl.to_band_bytes(n_pad, bw_band, isize)
                         / t_band / bw_peak, 3)

    # --- baseline: XLA QDWH eigh.  At M>=16k the baseline itself fails on
    # this setup (remote compile helper OOM-killed compiling eigh) while
    # the staged solver runs fine — report ours with a labeled null
    # baseline instead of crashing the bench.
    t_eigh = ev_gap = None
    compile_eigh_s = 0.0
    # mixed compares against the FAST f32 eigh (f64 eigh is software-
    # emulated on TPU) — the point of mixed is f64-level residuals at
    # f32-pipeline speed
    ad_base = ad.astype(jnp.float32) if mixed else ad
    try:
        eigh = jax.jit(jnp.linalg.eigh)
        t0 = time.time()
        w2, v2 = eigh(ad_base)
        _sync_scalar(w2)
        compile_eigh_s = time.time() - t0
        times = []
        for _ in range(3):
            t0 = time.time()
            w2, v2 = eigh(ad_base)
            _sync_scalar(w2 + v2[0, :])
            times.append(time.time() - t0)
        t_eigh = min(times)
        ev_gap = _sync_scalar(
            jnp.max(jnp.abs(p.values - w2[:p.values.shape[0]])))
    except Exception as exc:
        print(f"# eigh baseline failed at n={n}: {exc!r}"[:300],
              file=sys.stderr)

    eigh_txt = "FAILED" if t_eigh is None else \
        f"{t_eigh:.4f}s (first {compile_eigh_s:.1f}s)"
    gap_txt = "n/a" if ev_gap is None else f"{ev_gap:.2e}"
    print(f"# n={n} dtype={dtype_name} solver={solver} "
          f"ours={t_ours:.4f}s (first {compile_s:.1f}s) "
          f"eigh={eigh_txt} "
          f"resid={resid:.2e} orth={orth:.2e} |w-w_eigh|={gap_txt} "
          f"tflops={tflops:.2f} mfu={mfu if mfu is None else round(mfu, 4)} "
          f"stages={stage_times}",
          file=sys.stderr)

    extra = {}
    if not os.environ.get("EK_BENCH_QUICK"):
        extra = _bench_extras(jnp, solve, fl, n, platform)

    tag = f"sym_evp_m{n}_{dtype_name}"
    if n_vec:
        tag += f"_lowest{n_vec}"
    rec = {
        "metric": f"{tag}_time_to_solution",
        "value": round(t_ours, 5),
        "unit": "s",
        "vs_baseline": None if t_eigh is None
        else round(t_eigh / t_ours, 3),
        "tflops": round(tflops, 3),
        "mfu": None if mfu is None else round(mfu, 4),
        "hbm_frac": hbm_frac,
        "resid": float(f"{resid:.3e}"),
        "platform": platform,
    }
    if extra:
        rec["extra"] = extra
    print(json.dumps(rec))


def _row(solve, ad, bd=None, *, repeats=2, **kw):
    try:
        p, t, _, resid, orth = _measure(solve, ad, bd, repeats=repeats, **kw)
        return {"s": round(t, 4), "resid": float(f"{resid:.3e}"),
                "orth": float(f"{orth:.3e}")}
    except Exception as exc:  # keep the headline alive if one row dies
        print(f"# bench extra row failed: {exc!r}"[:400], file=sys.stderr)
        return {"error": f"{type(exc).__name__}"}


def _bench_extras(jnp, solve, fl, n_head: int, platform: str) -> dict:
    """Default extra rows (VERDICT r3 #2, r4 #4/#6): the generalized EVP
    (BASELINE.json's metric), the roofline-visible M=16384 scale point,
    the selecting lowest-500/16k config, and — LAST, because it flips
    x64 on — the BASELINE.md <=1e-12 mixed bar.  Risky/expensive
    compiles run after the cheap rows so one failure can't zero out the
    record (r4 verdict Weak #5)."""
    import jax

    from eigenkernel_tpu.obs.events import EventLog
    from eigenkernel_tpu.solvers.registry import get_spec, resolve_auto
    out = {}

    # generalized EVP (BASELINE.json metric), auto-resolved winner
    n = int(os.environ.get("EK_BENCH_GEN_N", "4096"))
    ad = jnp.asarray(_sym(n, "float32"))
    bd = jnp.asarray(_spd(n, "float32"))
    r = _row(solve, ad, bd, solver="general_auto", block_size=64)
    gname = resolve_auto("general_auto", n, True, False, False, platform)
    gspec = get_spec(gname)
    spec_fl = fl.pipeline_flops(gspec.core, True, gspec.reduction, n, n, 64)
    if "s" in r:
        r["solver"] = gname
        r["tflops"] = round(spec_fl / r["s"] / 1e12, 3)
    out[f"gen_m{n}"] = r

    # the scale point (XLA eigh cannot compile at 16k on this setup) —
    # roofline-visible: mfu/tflops vs chip peak + per-stage hbm_frac so
    # the driver record tracks two-stage progress (r4 verdict #6)
    if platform == "tpu" and not os.environ.get("EK_BENCH_NO16K"):
        n = 16384
        ad = jnp.asarray(_sym(n, "float32"))
        log = EventLog(stream=False)
        r = _row(solve, ad, solver="auto", repeats=2, log=log)
        if "s" in r:
            aname = resolve_auto("auto", n, False, False, False, platform)
            aspec = get_spec(aname)
            afl = fl.pipeline_flops(aspec.core, False, aspec.reduction,
                                    n, n, 128)
            peak = fl.chip_peak_flops(jax.devices()[0].device_kind,
                                      "float32")
            r["solver"] = aname
            r["tflops"] = round(afl / r["s"] / 1e12, 3)
            if peak:
                r["mfu"] = round(afl / r["s"] / peak, 4)
            stages = {e["name"]: round(e["val"], 4) for e in log.events()
                      if not e["name"].startswith("!")}
            if stages:
                r["stages"] = stages
            bw_peak = fl.chip_hbm_bw(jax.devices()[0].device_kind)
            t_band = stages.get("sep:full_to_band")
            if t_band and bw_peak:
                bw_band = int(os.environ.get("EK_TWOSTAGE_BW", "32"))
                r["hbm_frac_to_band"] = round(
                    fl.to_band_bytes(n, bw_band, 4) / t_band / bw_peak, 3)
        out[f"full_m{n}"] = r
        del ad

    # selecting lowest-500 at the scale point (reference -n path,
    # solver_scalapack_select.f90:56-60) — default since r5 (was
    # EK_BENCH_FULL-gated; r4 verdict #4)
    if platform == "tpu" and not os.environ.get("EK_BENCH_NO16K"):
        n, k = int(os.environ.get("EK_BENCH_SEL_N", "16384")), 500
        ad = jnp.asarray(_sym(n, "float32"))
        out[f"select_lowest{k}_m{n}"] = _row(
            solve, ad, solver="scalapack_select", n_vec=k, block_size=128,
            repeats=1)
        del ad

    # mixed precision at the headline M: f32 pipeline + Ozaki-GEMM
    # refinement; residual must clear 1e-12 (checked at f64).  LAST:
    # needs x64, and flipping it retraces everything after it.
    jax.config.update("jax_enable_x64", True)
    n = n_head
    ad = jnp.asarray(_sym(n, "float64"))
    out[f"mixed_m{n}"] = _row(solve, ad, solver="auto", dtype="mixed")
    if (platform == "tpu" and not os.environ.get("EK_BENCH_NO16K")
            and os.environ.get("EK_BENCH_MIXED16K", "1") != "0"):
        # the last unmet BASELINE bar single-chip hardware can prove
        # (r4 verdict #2): <=1e-12 at M=16384
        n = 16384
        ad = jnp.asarray(_sym(n, "float64"))
        out[f"mixed_m{n}"] = _row(solve, ad, solver="auto", dtype="mixed",
                                  repeats=1)
        del ad
    return out


if __name__ == "__main__":
    main()
