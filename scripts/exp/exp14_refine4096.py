# mixed refine at 4096: EK_REFINE_GEMM from env (f64|ozaki), target resid<=1e-12
import os, time, json, sys
import jax, numpy as np, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")
from eigenkernel_tpu.solvers import solve

n = int(os.environ.get("N", "4096"))
mode = os.environ.get("EK_REFINE_GEMM", "auto")
rng = np.random.default_rng(0)
a = rng.standard_normal((n, n))
a = ((a + a.T) / 2).astype(np.float64)

ad = jnp.asarray(a)  # upload once: 1 GB/call through the tunnel otherwise
for it in range(2):
    t0 = time.time()
    p = solve(ad, solver="scalapack", dtype="mixed")
    s = float(jnp.sum(p.values) + jnp.sum(p.vectors[0, :8]))
    dt = time.time() - t0
    V = np.asarray(jax.device_get(p.vectors)).astype(np.float64)
    w = np.asarray(jax.device_get(p.values)).astype(np.float64)
    r = a @ V - V * w[None, :]
    resid = float(np.abs(r).max() / np.linalg.norm(a))
    orth = float(np.abs(V.T @ V - np.eye(n)).max())
    print(json.dumps({"iter": it, "n": n, "gemm": mode,
                      "time_s": round(dt, 3), "resid": resid,
                      "orth": orth}), flush=True)
    if it == 0:
        import gc
        p = None  # free iter-0 eigenpairs (HBM headroom for the warm run)
        gc.collect()
