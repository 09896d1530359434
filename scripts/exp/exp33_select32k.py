# First M=32768 datapoint: selecting lowest-500 via the ONE-stage core
# (the only configuration that fits 16 GB HBM single-chip — see
# evidence/BUDGET_32K_r5.md).  EK_SELECT_CORE=one_stage is required: the
# TPU default would route to the two-stage core, whose chase-store
# repack peaks ~17.4 GB at this size.
import os, time, json, sys

os.environ.setdefault("EK_SELECT_CORE", "one_stage")
import jax, numpy as np, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")
from eigenkernel_tpu.solvers import solve
from eigenkernel_tpu.obs.events import EventLog
from eigenkernel_tpu.obs.mem import memstats

memstats("exp33:process_start", force=True)

n = int(os.environ.get("N", "32768"))
k = int(os.environ.get("K", "500"))
rng = np.random.default_rng(0)
# build the symmetric matrix in blocks to keep host RSS bounded
a = rng.standard_normal((n, n), dtype=np.float32)
a += a.T.copy()
a *= 0.5
ad = jnp.asarray(a)  # upload once (~4.3 GB; minutes through the tunnel)
w_host = None
del a
memstats("exp33:after_upload", force=True)

for it in range(int(os.environ.get("REPEATS", "2"))):
    log = EventLog(stream=False)
    t0 = time.time()
    p = solve(ad, solver="scalapack_select", n_vec=k, log=log)
    s = float(jnp.sum(p.values) + jnp.sum(p.vectors[0, :8]))
    dt = time.time() - t0
    stages = {e["name"]: round(e["val"], 3) for e in log.events()
              if not e["name"].startswith("!")}
    print(json.dumps({"iter": it, "n": n, "k": k,
                      "core": os.environ.get("EK_SELECT_CORE"),
                      "time_s": round(dt, 3), "stages": stages}),
          flush=True)
    if it == 0:
        import gc
        p = None
        gc.collect()

# device-side residual on a strided 64-column subset (host fetch of
# (32768, 64) is ~8 MB — fine; the full block would be ~35 s/GB)
cols = jnp.arange(0, k, max(1, k // 64))[:64]
V = p.vectors[:, cols]
w = p.values[cols]
r = ad @ V - V * w[None, :]
resid = float(jnp.max(jnp.abs(r)) / jnp.linalg.norm(ad))
print(json.dumps({"resid_max_64cols": float(f"{resid:.3e}")}), flush=True)
