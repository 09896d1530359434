# A/B the shear implementation inside the pallas chase: 'net' (log2(b)
# masked roll+select passes, the dominant per-tau compute per the dbg
# ladder) vs 'roll' (one strided tpu.DynamicRotate per b-row half).
# Sweeps (shear x config) at one n; correctness by |d|,|e| vs first.
import os, time, json, sys
import jax, numpy as np, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")
from eigenkernel_tpu.ops.pallas_chase import band_to_tridiag_pallas

n = int(os.environ.get("N", "4096")); bw = int(os.environ.get("BW", "32"))
rng = np.random.default_rng(0)
band = np.zeros((n, n), np.float32)
for d in range(bw + 1):
    v = rng.standard_normal(n - d).astype(np.float32)
    band[np.arange(n - d) + d, np.arange(n - d)] = v
band = band + band.T - np.diag(np.diag(band))
band_dev = jnp.asarray(band)
ref_de = None

t_start = time.time()
budget = int(os.environ.get("BUDGET_S", "5400"))
# configs: "G/io" triples; shear swept inner so net-vs-roll pairs share
# the warm state and compare within one process.
configs = os.environ.get("CONFIGS", "0/lane,0/align").split(",")
for cfg in configs:
    gsz, io = cfg.split("/")
    for shear in os.environ.get("SHEARS", "net,roll").split(","):
        if time.time() - t_start > budget:
            print(json.dumps({"skipped": f"{cfg}/{shear}"}), flush=True)
            continue
        os.environ["EK_PALLAS_CHASE_GROUP"] = gsz
        os.environ["EK_PALLAS_CHASE_IO"] = "lane" if io == "align" else io
        os.environ["EK_PALLAS_CHASE_ALIGN"] = "1" if io == "align" else "0"
        os.environ["EK_PALLAS_CHASE_SHEAR"] = shear
        f = jax.jit(lambda x: band_to_tridiag_pallas(x, bw))
        try:
            r = f(band_dev)
            float(jnp.sum(r.d))
            t0 = time.time()
            r = f(band_dev)
            s = float(jnp.sum(r.d) + jnp.sum(jnp.abs(r.e)))
            dt = time.time() - t0
            de = (np.asarray(jax.device_get(r.d)),
                  np.abs(np.asarray(jax.device_get(r.e))))
            if ref_de is None:
                ref_de = de; dmax = 0.0
            else:
                dmax = max(float(np.abs(de[0]-ref_de[0]).max()),
                           float(np.abs(de[1]-ref_de[1]).max()))
            print(json.dumps({"G": gsz, "io": io, "shear": shear,
                              "n": n, "bw": bw, "time_s": round(dt, 3),
                              "maxdiff_vs_first": float(f"{dmax:.3e}")}),
                  flush=True)
        except Exception as exc:
            print(json.dumps({"G": gsz, "io": io, "shear": shear,
                              "err": str(exc)[:160]}), flush=True)
        jax.clear_caches()
