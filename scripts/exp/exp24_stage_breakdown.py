# Properly-synced per-stage two-stage breakdown (the pipeline's event
# timings are unreliable on the tunneled TPU: block_until_ready does not
# synchronize there — each stage here is timed via a dependent scalar
# fetch).  N/BW env; prints one JSON line per stage per iter.
import os, time, json
os.environ.setdefault("EK_TWOSTAGE_BW", os.environ.get("BW", "32"))
import jax, numpy as np, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import sys
sys.path.insert(0, "/root/repo")
from eigenkernel_tpu.solvers.twostage import (
    _j_to_band, _j_band_to_tridiag, _j_back_transform_two_stage)
from eigenkernel_tpu.solvers.pipelines import _j_tridiag_eigh

n = int(os.environ.get("N", "8192"))
bw = int(os.environ.get("BW", "32"))
n_vec = int(os.environ.get("NVEC", "0")) or n   # <n = selecting path
rng = np.random.default_rng(0)
a = rng.standard_normal((n, n)).astype(np.float32)
a = (a + a.T) / 2
ad = jnp.asarray(a)


def sync(x):
    leaves = [l for l in jax.tree.leaves(x) if hasattr(l, "dtype")]
    return float(sum(jnp.sum(jnp.abs(l[..., :2])) for l in leaves))


for it in range(2):
    out = {"iter": it, "n": n, "bw": bw, "n_vec": n_vec}
    with jax.default_matmul_precision("highest"):
        t0 = time.time()
        band_res = _j_to_band(ad, bw, None)
        sync(band_res.band)
        out["to_band"] = round(time.time() - t0, 3)

        t0 = time.time()
        chase = _j_band_to_tridiag(band_res.band, bw, "pallas", None)
        sync((chase.d, chase.e))
        out["chase"] = round(time.time() - t0, 3)

        band_res = band_res._replace(band=None)
        t0 = time.time()
        w, z = _j_tridiag_eigh(chase.d, chase.e, n_vec, None)
        sync(w)
        out["eigh"] = round(time.time() - t0, 3)

        t0 = time.time()
        zz = _j_back_transform_two_stage(band_res, chase, z, bw, None,
                                         os.environ.get("BT", "wavefront"))
        sync(zz)
        out["back_transform"] = round(time.time() - t0, 3)
    out["total"] = round(sum(v for k, v in out.items()
                             if k not in ("iter", "n", "bw", "n_vec")), 3)
    print(json.dumps(out), flush=True)

# residual spot check on a few columns
V = np.asarray(jax.device_get(zz[:, :32]))
wv = np.asarray(jax.device_get(w[:32]))
r = a @ V - V * wv[None, :]
print(json.dumps({"resid_max_32cols_over_normF":
                  float(np.abs(r).max() / np.linalg.norm(a))}), flush=True)
