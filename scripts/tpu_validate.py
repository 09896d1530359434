"""Hardware validation ladder for the real TPU (round-2 task #2).

Runs, in strict order (one process, serial — never kill mid-compile):
  1. smoke matmul
  2. Pallas kernels vs scan paths at small n (sturm, solve, backtransform)
  3. wavefront chase vs sequential (bit-identical reflectors)
  4. blocked back-transform vs per-sweep
  5. per-path timings at EK_VAL_N (default 1024) to pick bench defaults

Prints one JSON line per step to stdout; full log to stderr.  Designed to
be restartable: steps are independent, failures are caught and reported.

Usage:  nohup python scripts/tpu_validate.py > /tmp/tpu_validate.out 2>&1 &
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def emit(step, **kw):
    print(json.dumps({"step": step, **kw}), flush=True)


def sync(x):
    import jax.numpy as jnp

    return float(jnp.sum(jnp.abs(x)))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    t0 = time.time()
    try:
        dev = jax.devices()[0]
        x = jnp.ones((256, 256), jnp.float32)
        s = sync(x @ x)
        emit("smoke", ok=True, device=str(dev.device_kind),
             secs=round(time.time() - t0, 1), val=s)
    except Exception as exc:
        emit("smoke", ok=False, err=repr(exc)[:300],
             secs=round(time.time() - t0, 1))
        return 1

    rng = np.random.default_rng(0)
    n, bw = 256, 16

    # --- pallas sturm vs scan
    try:
        from eigenkernel_tpu.ops.tridiag import bisect_eigenvalues
        d = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        e = jnp.asarray(rng.standard_normal(n - 1).astype(np.float32))
        idx = jnp.arange(64)
        t0 = time.time()
        w_p = np.asarray(bisect_eigenvalues(d, e, idx, method="pallas"))
        t_first = time.time() - t0
        w_s = np.asarray(bisect_eigenvalues(d, e, idx, method="scan"))
        err = float(np.abs(w_p - w_s).max())
        emit("pallas_sturm", ok=err < 1e-4, err_val=err,
             compile_s=round(t_first, 1))
    except Exception as exc:
        emit("pallas_sturm", ok=False, err=repr(exc)[:300])

    # --- pallas tridiag solve vs scan
    try:
        from eigenkernel_tpu.ops.pallas_solve import tridiag_solve_pallas
        from eigenkernel_tpu.ops.tridiag import tridiag_solve_shifted
        lam = jnp.asarray(np.linspace(-1, 1, 32).astype(np.float32))
        b = jnp.asarray(rng.standard_normal((n, 32)).astype(np.float32))
        t0 = time.time()
        x_p = np.asarray(tridiag_solve_pallas(d, e, lam, b))
        t_first = time.time() - t0
        x_s = np.asarray(tridiag_solve_shifted(d, e, lam, b))
        num = np.abs(x_p - x_s).max()
        den = max(np.abs(x_s).max(), 1.0)
        emit("pallas_solve", ok=float(num / den) < 1e-3,
             rel_err=float(num / den), compile_s=round(t_first, 1))
    except Exception as exc:
        emit("pallas_solve", ok=False, err=repr(exc)[:300])

    # --- chase: wavefront vs sequential (identical reflectors)
    try:
        from eigenkernel_tpu.ops import bulge
        a = rng.standard_normal((n, n)).astype(np.float32)
        a = a + a.T
        band = jnp.asarray(np.triu(np.tril(a, bw), -bw))
        t0 = time.time()
        r_seq = bulge.band_to_tridiag(band, bw=bw)
        d1, e1 = np.asarray(r_seq.d), np.asarray(r_seq.e)
        t_seq = time.time() - t0
        t0 = time.time()
        r_wf = bulge.band_to_tridiag(band, bw=bw, schedule="wavefront")
        d2, e2 = np.asarray(r_wf.d), np.asarray(r_wf.e)
        t_wf = time.time() - t0

        def evs(d, e):
            import scipy.linalg as sla
            return sla.eigvalsh_tridiagonal(d.astype(np.float64),
                                            e.astype(np.float64))

        # orthogonal-similarity-invariant comparison (individual
        # reflectors legitimately differ in low precision)
        err = float(np.abs(evs(d1, e1) - evs(d2, e2)).max())
        emit("wavefront_chase", ok=err < 1e-3, err_val=err,
             first_seq_s=round(t_seq, 1), first_wf_s=round(t_wf, 1))
    except Exception as exc:
        emit("wavefront_chase", ok=False, err=repr(exc)[:300])

    # --- back-transform: blocked + pallas vs per-sweep.  The comparison
    # GEMMs must run at 'highest' matmul precision: TPU lowers f32 matmuls
    # to bf16 passes by default, which reads as a ~1e-1 path mismatch
    # (observed 0.08) when it is really baseline rounding.
    try:
        from eigenkernel_tpu.ops import bulge
        from eigenkernel_tpu.ops.pallas_backtransform import (
            apply_chase_q_pallas)
        z = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
        with jax.default_matmul_precision("highest"):
            z_ref = np.asarray(bulge.apply_chase_q(r_seq, z, bw=bw))
            z_blk = np.asarray(bulge.apply_chase_q_blocked(r_seq, z, bw=bw))
        err_b = float(np.abs(z_ref - z_blk).max())
        emit("blocked_bt", ok=err_b < 1e-4, err_val=err_b)
        t0 = time.time()
        z_pal = np.asarray(apply_chase_q_pallas(r_seq.HV, r_seq.HT, z,
                                                bw=bw))
        err_p = float(np.abs(z_ref - z_pal).max())
        emit("pallas_bt", ok=err_p < 1e-4, err_val=err_p,
             compile_s=round(time.time() - t0, 1))
    except Exception as exc:
        emit("pallas_bt", ok=False, err=repr(exc)[:300])

    # --- timing ladder at a real size (cache-warm second calls)
    nv = int(os.environ.get("EK_VAL_N", "1024"))
    try:
        from eigenkernel_tpu.solvers.api import solve
        a = rng.standard_normal((nv, nv)).astype(np.float32)
        a = (a + a.T) / 2
        ad = jnp.asarray(a)
        results = {}
        for solver, env in [("scalapack", {}),
                            ("eigensx", {"EK_CHASE": "sequential"}),
                            ("eigensx", {"EK_CHASE": "wavefront"}),
                            ("jacobi", {})]:
            for k, v in env.items():
                os.environ[k] = v
            try:
                p = solve(ad, solver=solver, block_size=128)
                sync(p.values)
                t0 = time.time()
                p = solve(ad, solver=solver, block_size=128)
                sync(p.values + p.vectors[0, :])
                results[f"{solver}:{env.get('EK_CHASE', '')}"] = \
                    round(time.time() - t0, 3)
            except Exception as exc:
                results[f"{solver}:{env.get('EK_CHASE', '')}"] = \
                    f"FAIL {repr(exc)[:120]}"
            for k in env:
                del os.environ[k]
        eigh = jax.jit(jnp.linalg.eigh)
        w, v = eigh(ad)
        sync(w)
        t0 = time.time()
        w, v = eigh(ad)
        sync(w + v[0, :])
        results["xla_eigh"] = round(time.time() - t0, 3)
        emit("timing", ok=True, n=nv, **{k.replace(":", "_") or k: v
                                         for k, v in results.items()})
    except Exception as exc:
        emit("timing", ok=False, err=repr(exc)[:300])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
