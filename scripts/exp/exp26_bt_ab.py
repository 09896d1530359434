# A/B the stage-2 chase back-transform variants on hardware: blocked
# (sequential WY windows) vs wavefront (anti-diagonal batched covers).
# Builds band+chase once, then times each BT method warm via dependent-
# scalar fetch.  N/BW/K env; METHODS comma list.
import os, time, json
os.environ.setdefault("EK_TWOSTAGE_BW", os.environ.get("BW", "32"))
import jax, numpy as np, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import sys
sys.path.insert(0, "/root/repo")
from eigenkernel_tpu.solvers.twostage import (
    _j_to_band, _j_band_to_tridiag, _j_back_transform_two_stage)

n = int(os.environ.get("N", "8192"))
bw = int(os.environ.get("BW", "32"))
k = int(os.environ.get("K", "0")) or n
methods = os.environ.get("METHODS", "wavefront,blocked").split(",")
rng = np.random.default_rng(0)
a = rng.standard_normal((n, n)).astype(np.float32)
a = (a + a.T) / 2
ad = jnp.asarray(a)

with jax.default_matmul_precision("highest"):
    band_res = _j_to_band(ad, bw, None)
    chase = _j_band_to_tridiag(band_res.band, bw, "pallas", None)
    band_res = band_res._replace(band=None)
    z0 = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))
    ref = None
    for m in methods:
        for it in range(2):
            t0 = time.time()
            zz = _j_back_transform_two_stage(band_res, chase, z0, bw,
                                             None, m)
            s = float(jnp.sum(jnp.abs(zz[:, :2])))
            dt = time.time() - t0
            print(json.dumps({"method": m, "iter": it, "n": n, "bw": bw,
                              "k": k, "time_s": round(dt, 3)}), flush=True)
        zh = np.asarray(jax.device_get(zz[:, :8]))
        if ref is None:
            ref = zh
        else:
            print(json.dumps({"method": m,
                              "maxdiff_vs_first":
                              float(np.abs(zh - ref).max())}), flush=True)
