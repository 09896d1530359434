# mixed refine at 16384: device-side residual check (host fetch of the
# 1 GB eigenvector matrix is ~35 s over the tunnel and the host f64 GEMM
# is ~15 min on this 1-CPU box — fetch scalars instead).
import os, time, json, sys
import jax, numpy as np, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")
from eigenkernel_tpu.solvers import solve
from eigenkernel_tpu.ops.ozaki import ozaki_matmul_chunked
from eigenkernel_tpu.obs.mem import memstats

# a leaked/degraded worker after a prior OOM crash is indistinguishable
# from a real OOM without this: print the allocator state up front
memstats("exp19:process_start", force=True)

n = int(os.environ.get("N", "16384"))
mode = os.environ.get("EK_REFINE_GEMM", "auto")
rng = np.random.default_rng(0)
a = rng.standard_normal((n, n))
a = ((a + a.T) / 2).astype(np.float64)
ad = jnp.asarray(a)


@jax.jit
def quality(w, v, ad):
    # residual at f64 via the Ozaki GEMM (exact MXU slice products) —
    # the plain emulated-f64 TPU matmul has a ~1.8e-9 truncation floor,
    # which would hide sub-1e-9 residuals.  Checked on a strided
    # 1024-column subset (spans the spectrum): at 4096 columns the
    # chunked-Ozaki scan bodies held ~16 GB of (n, 4096) f32 product/
    # TwoSum temps and the check itself OOM'd AFTER the refinement
    # succeeded (r5 chain K).
    v64 = v[:, ::16].astype(jnp.float64)
    w64 = w[::16].astype(jnp.float64)
    k = v64.shape[1]
    av = ozaki_matmul_chunked(ad, v64)
    r = av - v64 * w64[None, :]
    g = ozaki_matmul_chunked(v64.T, v64) - jnp.eye(k, dtype=jnp.float64)
    return (jnp.max(jnp.abs(r)) / jnp.linalg.norm(ad),
            jnp.max(jnp.abs(g)))


for it in range(2):
    t0 = time.time()
    p = solve(ad, solver="scalapack", dtype="mixed")
    s = float(jnp.sum(p.values) + jnp.sum(p.vectors[0, :8]))
    dt = time.time() - t0
    resid, orth = quality(p.values, p.vectors, ad)
    resid, orth = float(resid), float(orth)
    print(json.dumps({"iter": it, "n": n, "gemm": mode,
                      "time_s": round(dt, 3), "resid": resid,
                      "orth": orth}), flush=True)
    if it == 0:
        import gc
        p = None  # free iter-0 eigenpairs (HBM headroom for the warm run)
        gc.collect()
