# select lowest-500 of 16384: two-stage core (default on TPU) vs VERDICT 10.54s
import os, time, json, sys
import jax, numpy as np, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")
from eigenkernel_tpu.solvers import solve
from eigenkernel_tpu.obs.events import EventLog

n = int(os.environ.get("N", "16384")); k = int(os.environ.get("K", "500"))
rng = np.random.default_rng(0)
if os.environ.get("CLUSTER"):
    # forced cluster straddling the selection edge, exact spectrum via a
    # product of 3 Householder reflectors (O(n^2) build, no QR)
    w = np.sort(rng.standard_normal(n).astype(np.float64) * 10.0)
    w[k - 12:k + 12] = w[k - 12] + np.arange(24) * 1e-7
    a = np.diag(w)
    for s in range(3):
        v = rng.standard_normal(n); v /= np.linalg.norm(v)
        av = a @ v
        a -= 2.0 * np.outer(v, av)          # H a
        a -= 2.0 * np.outer((a @ v), v)     # (H a) H ... using updated a
    a = ((a + a.T) / 2).astype(np.float32)
    w_true = w
else:
    a = rng.standard_normal((n, n)).astype(np.float32)
    a = (a + a.T) / 2
    w_true = None

ad = jnp.asarray(a)  # upload once: 1 GB/call through the tunnel otherwise
for it in range(3):
    log = EventLog(stream=False) if it <= 1 else None
    t0 = time.time()
    p = solve(ad, solver="scalapack_select", n_vec=k, log=log)
    s = float(jnp.sum(p.values) + jnp.sum(p.vectors[0, :8]))
    dt = time.time() - t0
    stages = {} if log is None else {
        e["name"]: round(e["val"], 3) for e in log.events()
        if not e["name"].startswith("!")}
    print(json.dumps({"iter": it, "n": n, "k": k,
                      "core": os.environ.get("EK_SELECT_CORE", "auto"),
                      "time_s": round(dt, 3), "stages": stages}), flush=True)
    if it <= 1:
        import gc
        p = None  # free iter-0 eigenpairs (HBM headroom for the warm run)
        gc.collect()
V = np.asarray(jax.device_get(p.vectors))
w = np.asarray(jax.device_get(p.values))
r = a @ V - V * w[None, :]
print("resid_max/||A||_F:", float(np.abs(r).max() / np.linalg.norm(a)))
print("orth_max:", float(np.abs(V.T @ V - np.eye(k)).max()))
if w_true is not None:
    print("val_err_max:", float(np.abs(w - w_true[:k]).max()))
