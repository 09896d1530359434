# Hardware bring-up for the VMEM-column-tile wavefront BT kernel
# (ops/pallas_wf_bt.py): correctness vs the XLA wavefront at N0, then
# warm timing ladder.  N sizes / G via env.
import os, time, json, traceback
os.environ.setdefault("EK_TWOSTAGE_BW", os.environ.get("BW", "32"))
import jax, numpy as np, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import sys
sys.path.insert(0, "/root/repo")
from eigenkernel_tpu.solvers.twostage import _j_to_band, _j_band_to_tridiag
from eigenkernel_tpu.ops.bulge import apply_chase_q_wavefront
from eigenkernel_tpu.ops.pallas_wf_bt import apply_chase_q_wavefront_pallas

bw = int(os.environ.get("BW", "32"))
g = int(os.environ.get("G", "64"))
sizes = [int(s) for s in os.environ.get("NS", "4096,8192,16384").split(",")]
rng = np.random.default_rng(0)

for n in sizes:
    a = rng.standard_normal((n, n)).astype(np.float32)
    a = (a + a.T) / 2
    ad = jnp.asarray(a)
    with jax.default_matmul_precision("highest"):
        band_res = _j_to_band(ad, bw, None)
        chase = _j_band_to_tridiag(band_res.band, bw, "pallas", None)
        del band_res, ad       # the dense band matrix is dead: at
        # n=16384 the extra 2x1.07 GB tipped the pipeline into HBM
        # RESOURCE_EXHAUSTED (r4 chain wfp3)
        z0 = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
        try:
            for it in range(2):
                t0 = time.time()
                zz = apply_chase_q_wavefront_pallas(chase, z0, bw, group=g)
                s = float(jnp.sum(jnp.abs(zz[:, :2])))
                print(json.dumps({"n": n, "g": g, "iter": it,
                                  "wfp_s": round(time.time() - t0, 3)}),
                      flush=True)
        except Exception:
            traceback.print_exc()
            print(json.dumps({"n": n, "g": g, "wfp": "FAILED"}),
                  flush=True)
            continue
        if n <= 8192:
            ref = apply_chase_q_wavefront(chase, z0, bw, group=g)
            d = float(jnp.max(jnp.abs(zz[:, :64] - ref[:, :64])))
            sc = float(jnp.max(jnp.abs(ref[:, :64])))
            print(json.dumps({"n": n, "maxdiff_rel": d / max(sc, 1.0)}),
                  flush=True)
    del chase, z0
