#!/usr/bin/env python3
"""Full ``-s`` solver sweep on one problem — the reference's raison d'être
(README.md:4-5: "test various combinations ... and find the best one").

Runs every applicable registry solver on the same (random SPD-pencil or
MatrixMarket) problem, timing each end-to-end and per stage, and prints a
comparison table + JSON lines.

Usage:
  python scripts/sweep.py [--n 2048] [--dtype float32|float64|mixed]
                          [--generalized] [--mesh R,C]
                          [--matrix A.mtx [--matrix-b B.mtx]]
                          [--solvers name1,name2,...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "float64", "mixed"])
    ap.add_argument("--generalized", action="store_true")
    ap.add_argument("--mesh", default="")
    ap.add_argument("--matrix", default="")
    ap.add_argument("--matrix-b", default="")
    ap.add_argument("--solvers", default="")
    ap.add_argument("--select-k", type=int, default=0,
                    help="also sweep the selecting solvers at n_vec=K")
    ap.add_argument("--platform", default="")
    ap.add_argument("--budget-s", type=float, default=0.0,
                    help="skip solvers not yet started after this many "
                         "seconds (protects the remote-compile queue)")
    args = ap.parse_args()
    t_sweep0 = time.time()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.dtype in ("float64", "mixed"):
        jax.config.update("jax_enable_x64", True)
    # default to the repo cache: remote TPU compiles are minutes each and
    # the sweep's whole point is many configs — never run it uncached
    cache = os.environ.get("EK_CACHE_DIR") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from eigenkernel_tpu.io import matrix_market as mm
    from eigenkernel_tpu.obs.events import EventLog
    from eigenkernel_tpu.parallel.mesh import make_mesh
    from eigenkernel_tpu.solvers import SOLVERS, solve
    from eigenkernel_tpu.verify import eval_residual_norm

    host_dtype = np.float32 if args.dtype == "float32" else np.float64
    if args.matrix:
        a = mm.read_matrix(args.matrix).to_dense(host_dtype)
        b = mm.read_matrix(args.matrix_b).to_dense(host_dtype) \
            if args.matrix_b else None
        generalized = b is not None
    else:
        rng = np.random.default_rng(0)
        n = args.n
        a = rng.standard_normal((n, n))
        a = ((a + a.T) / 2).astype(host_dtype)
        b = None
        generalized = args.generalized
        if generalized:
            br = rng.standard_normal((n, n))
            b = (br @ br.T + n * np.eye(n)).astype(host_dtype)

    # device-place ONCE: a host numpy operand inside the timed call adds
    # a ~2.2 s (67 MB @ ~30 MB/s tunnel) host->device transfer to every
    # solver uniformly (observed in the r4 sweep_std4096 run: eigh 2.35 s
    # vs its 0.15 s compute)
    a = jnp.asarray(a)
    if b is not None:
        b = jnp.asarray(b)

    mesh = None
    if args.mesh:
        r, c = args.mesh.split(",")
        mesh = make_mesh(shape=(int(r), int(c)))

    names = args.solvers.split(",") if args.solvers else [
        s.name for s in SOLVERS.values()
        if s.generalized == generalized and not s.selecting]
    if args.select_k and not args.solvers:
        names += [s.name for s in SOLVERS.values()
                  if s.generalized == generalized and s.selecting]
    dtype_arg = "mixed" if args.dtype == "mixed" else None

    rows = []
    for name in names:
        # a selecting name passed via --solvers without --select-k gets a
        # sane default (None ⇒ solve() picks full/k default), not k=0
        n_vec = (args.select_k or None) if SOLVERS[name].selecting else None
        spec = SOLVERS[name]
        if spec.single_device and mesh is not None:
            pass  # lapack ignores the mesh by design
        if args.budget_s and time.time() - t_sweep0 > args.budget_s:
            rows.append({"solver": name, "skipped": "budget"})
            print(json.dumps(rows[-1]), flush=True)
            continue
        log = EventLog(stream=False)
        try:
            # warm-up/compile WITH a throwaway log: the tick barrier
            # compiles one tiny dependent-scalar program per stage-output
            # shape, and on the remote TPU those compiles cost seconds —
            # without this they land inside the timed run and get
            # misattributed to stages (r4e sweep: scalapack
            # "tridiagonalize 11.19 s" was a barrier compile)
            p = solve(a, b, solver=name, mesh=mesh, dtype=dtype_arg,
                      n_vec=n_vec, log=EventLog(stream=False))
            jax.device_get(p.values[:1])
            t0 = time.time()
            p = solve(a, b, solver=name, mesh=mesh, dtype=dtype_arg,
                      n_vec=n_vec, log=log)
            jax.device_get(p.values[:1] + p.vectors[0, :1])
            dt = time.time() - t0
            _, _, rmax = eval_residual_norm(a, p, min(p.n_vec, 64), b)
            rows.append({"solver": name, "time_s": round(dt, 4),
                         **({"n_vec": n_vec} if n_vec else {}),
                         "resid_max": float(f"{rmax:.3e}"),
                         "stages": {e["name"]: round(e["val"], 4)
                                    for e in log.events()}})
        except Exception as exc:  # keep sweeping (reference: terminate())
            import traceback
            traceback.print_exc(file=sys.stderr)
            rows.append({"solver": name, "error": str(exc)[:120]})
        print(json.dumps(rows[-1]), flush=True)

    ok = [r for r in rows if "time_s" in r]
    if ok:
        best = min(ok, key=lambda r: r["time_s"])
        print(f"\nbest solver: {best['solver']} ({best['time_s']}s)")
        print(f"{'solver':32s} {'time[s]':>9s} {'resid_max':>11s}")
        for r in sorted(ok, key=lambda r: r["time_s"]):
            print(f"{r['solver']:32s} {r['time_s']:9.4f} "
                  f"{r['resid_max']:11.3e}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
