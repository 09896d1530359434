# A/B the to_band bucketing split on hardware (EK_TOBAND_SPLIT): the
# halving recursion costs 1.71x the ideal n^3*4/bw bytes; split=8 costs
# 1.14x.  Warm second-call timing via dependent-scalar fetch.
import os, time, json, sys
import jax, numpy as np, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")
from eigenkernel_tpu.ops import band as bandlib

n = int(os.environ.get("N", "8192"))
bw = int(os.environ.get("BW", "32"))
rng = np.random.default_rng(0)
a = rng.standard_normal((n, n)).astype(np.float32)
a = (a + a.T) / 2
ad = jnp.asarray(a)

ref = None
for split in os.environ.get("SPLITS", "2,4,8").split(","):
    os.environ["EK_TOBAND_SPLIT"] = split
    f = jax.jit(lambda x: bandlib.to_band(x, bw))
    with jax.default_matmul_precision("highest"):
        r = f(ad)
        float(jnp.sum(r.band[:1, :1]))
        times = []
        for _ in range(3):      # min-over-3: one-shot timings at 8k read
            t0 = time.time()    # 1.38 s where exp24 reads 0.27 s (r5)
            r = f(ad)
            float(jnp.sum(r.band[:1, :1]))
            times.append(time.time() - t0)
        dt = min(times)
        s = float(jnp.sum(jnp.abs(jnp.diagonal(r.band))))
    floor = n ** 3 * 4 / bw / 819e9
    print(json.dumps({"n": n, "bw": bw, "split": int(split),
                      "time_s": round(dt, 4), "times": [round(t, 4)
                                                        for t in times],
                      "hbm_frac": round(floor / dt, 3),
                      "diag_sum": round(s, 3)}), flush=True)
    if ref is None:
        ref = s
    elif abs(s - ref) > 1e-2 * max(abs(ref), 1):
        print(json.dumps({"split": int(split), "MISMATCH": s - ref}),
              flush=True)
