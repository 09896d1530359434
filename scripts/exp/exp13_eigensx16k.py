# eigensx (two-stage, pallas chase) at n=16384 vs one-stage record (12.24s)
import os, time, json
os.environ.setdefault("EK_TWOSTAGE_BW", "32")
import jax, numpy as np, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import sys
sys.path.insert(0, "/root/repo")
from eigenkernel_tpu.solvers import solve
from eigenkernel_tpu.obs.events import EventLog

n = int(os.environ.get("N", "16384"))
rng = np.random.default_rng(0)
a = rng.standard_normal((n, n)).astype(np.float32)
a = (a + a.T) / 2

def sync(p):
    return float(jnp.sum(p.values) + jnp.sum(p.vectors[0, :8]))

ad = jnp.asarray(a)  # upload once: 1 GB/call through the tunnel otherwise
for it in range(3):
    log = EventLog(stream=False) if it <= 1 else None
    t0 = time.time()
    p = solve(ad, solver="eigensx", log=log)
    s = sync(p)
    dt = time.time() - t0
    stages = {} if log is None else {
        e["name"]: round(e["val"], 3) for e in log.events()
        if not e["name"].startswith("!")}
    print(json.dumps({"iter": it, "n": n, "time_s": round(dt, 3),
                      "stages": stages}), flush=True)
    if it <= 1:
        # drop iter-0 eigenpairs before the warm run: at n=16384 two
        # live (values, vectors) sets + stores exceed HBM (observed
        # RESOURCE_EXHAUSTED on the warm back_transform)
        import gc
        p = None
        gc.collect()
# residual on a few columns
V = np.asarray(jax.device_get(p.vectors[:, :64]))
w = np.asarray(jax.device_get(p.values[:64]))
r = a @ V - V * w[None, :]
print("resid_max(64 cols)/||A||_F:",
      float(np.abs(r).max() / np.linalg.norm(a)))
