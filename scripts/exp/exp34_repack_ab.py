# A/B the chase-store repack at full size: TPU scatter vs the gather-free
# roll-shear (EK_CHASE_REPACK). Warm second-call timing, dependent fetch
# includes an HV element so the repack is inside the timed program.
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

ref = None
for mode in os.environ.get("MODES", "scatter,shear").split(","):
    os.environ["EK_CHASE_REPACK"] = mode
    f = jax.jit(lambda x: band_to_tridiag_pallas(x, bw))
    try:
        r = f(band_dev)
        float(jnp.sum(r.d))
        t0 = time.time()
        r = f(band_dev)
        s = float(jnp.sum(r.d) + jnp.sum(jnp.abs(r.e))
                  + jnp.sum(jnp.abs(r.HV[:, 0, :])) + jnp.sum(r.HT[:, 0]))
        dt = time.time() - t0
        print(json.dumps({"repack": mode, "n": n, "bw": bw,
                          "time_s": round(dt, 3),
                          "check": round(s, 3)}), flush=True)
        if ref is None:
            ref = s
        elif abs(s - ref) > 1e-3 * max(abs(ref), 1):
            print(json.dumps({"repack": mode, "MISMATCH": s - ref}),
                  flush=True)
    except Exception as exc:
        print(json.dumps({"repack": mode, "err": str(exc)[:300]}),
              flush=True)
    jax.clear_caches()
