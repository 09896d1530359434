# Chase backend A/B at one size: pallas vs XLA wavefront2 (+ the
# one-stage scalapack total as a device-speed canary — known-good
# r2 record: 0.250 s at n=4096 f32).  Discriminates a uniform device
# slowdown from a pallas-row-copy-specific one.
import os, time, json, sys
import jax, numpy as np, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")

n = int(os.environ.get("N", "4096")); bw = int(os.environ.get("BW", "32"))
rng = np.random.default_rng(0)

# canary: one-stage solve (GEMM + HBM bound, no pallas)
from eigenkernel_tpu.solvers import solve
a = rng.standard_normal((n, n)).astype(np.float32)
a = (a + a.T) / 2
ad = jnp.asarray(a)  # upload once: 1 GB/call through the tunnel otherwise
for it in range(2):
    t0 = time.time()
    p = solve(ad, solver="scalapack")
    s = float(jnp.sum(p.values) + jnp.sum(p.vectors[0, :8]))
    print(json.dumps({"what": "scalapack_canary", "iter": it, "n": n,
                      "time_s": round(time.time() - t0, 3)}), flush=True)

band = np.zeros((n, n), np.float32)
for d in range(bw + 1):
    v = rng.standard_normal(n - d).astype(np.float32)
    band[np.arange(n - d) + d, np.arange(n - d)] = v
band = band + band.T - np.diag(np.diag(band))
band_dev = jnp.asarray(band)

from eigenkernel_tpu.ops.pallas_chase import band_to_tridiag_pallas
from eigenkernel_tpu.ops.bulge import band_to_tridiag_wavefront2

for name, fn in (("pallas", band_to_tridiag_pallas),
                 ("wavefront2", band_to_tridiag_wavefront2)):
    f = jax.jit(lambda x, fn=fn: fn(x, bw))
    try:
        r = f(band_dev)
        float(jnp.sum(r.d))
        t0 = time.time()
        r = f(band_dev)
        s = float(jnp.sum(r.d) + jnp.sum(jnp.abs(r.e)))
        print(json.dumps({"what": name, "n": n, "bw": bw,
                          "time_s": round(time.time() - t0, 3)}), flush=True)
    except Exception as exc:
        print(json.dumps({"what": name, "err": str(exc)[:200]}), flush=True)
    jax.clear_caches()
