# Split the pallas chase per-step cost at large n: dbg=11 (loads only),
# dbg=0 (loads+identity stores), dbg=2 (full compute), x fuse.
import os, time, json, sys
import jax, numpy as np, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")
from eigenkernel_tpu.ops.pallas_chase import band_to_tridiag_pallas

n = int(os.environ.get("N", "16384")); bw = int(os.environ.get("BW", "32"))
rng = np.random.default_rng(0)
band = np.zeros((n, n), np.float32)
for d in range(bw + 1):
    v = rng.standard_normal(n - d).astype(np.float32)
    band[np.arange(n - d) + d, np.arange(n - d)] = v
band = band + band.T - np.diag(np.diag(band))
band_dev = jnp.asarray(band)

t_start = time.time()
budget = int(os.environ.get("BUDGET_S", "3600"))
for io in os.environ.get("IOS", "lane,align").split(","):
  for dbg in os.environ.get("DBGS", "11,0,2").split(","):
    for fuse in os.environ.get("FUSES", "4,8").split(","):
        if time.time() - t_start > budget:
            # self-budget between configs: an external timeout killing a
            # remote compile mid-flight wedges the TPU queue for ~40 min
            print(json.dumps({"skipped": f"{io}/{dbg}/{fuse}",
                              "reason": "budget"}), flush=True)
            continue
        os.environ["EK_PALLAS_CHASE_DBG"] = dbg
        os.environ["EK_PALLAS_CHASE_FUSE"] = fuse
        os.environ["EK_PALLAS_CHASE_ALIGN"] = "1" if io == "align" else "0"
        f = jax.jit(lambda x: band_to_tridiag_pallas(x, bw))
        try:
            r = f(band_dev)          # compile + run
            float(jnp.sum(r.d))
            t0 = time.time()
            r = f(band_dev)
            s = float(jnp.sum(r.d) + jnp.sum(r.e))
            dt = time.time() - t0
            print(json.dumps({"io": io, "dbg": dbg, "fuse": fuse, "n": n, "bw": bw,
                              "time_s": round(dt, 3)}), flush=True)
        except Exception as exc:
            print(json.dumps({"io": io, "dbg": dbg, "fuse": fuse,
                              "err": str(exc)[:200]}), flush=True)
        jax.clear_caches()
