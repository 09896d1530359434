# Profile the wf_bt v2 pipeline: where does the 1.9 s at n=8192 go —
# the XLA P-stream build (_p_stream: embed/gram/triangular_solve/P) or
# the pallas kernel lane loop?  Times each piece warm with dependent-
# scalar sync.  N/G/BW via env.
import os, time, json
os.environ.setdefault("EK_TWOSTAGE_BW", os.environ.get("BW", "32"))
import jax, numpy as np, jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import sys
sys.path.insert(0, "/root/repo")
from eigenkernel_tpu.solvers.twostage import _j_to_band, _j_band_to_tridiag
from eigenkernel_tpu.ops import pallas_wf_bt as W
from eigenkernel_tpu.ops.bulge import wavefront_stores

bw = int(os.environ.get("BW", "32"))
n = int(os.environ.get("N", "8192"))
rng = np.random.default_rng(0)


def sync(x):
    return float(jnp.sum(jnp.abs(x[:1, :1])))


a = rng.standard_normal((n, n)).astype(np.float32)
a = (a + a.T) / 2
ad = jnp.asarray(a)
with jax.default_matmul_precision("highest"):
    band_res = _j_to_band(ad, bw, None)
    chase = _j_band_to_tridiag(band_res.band, bw, "pallas", None)
z0 = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
del ad, a

for g in [int(s) for s in os.environ.get("GS", "64,96").split(",")]:
    b = bw
    nsweeps = n - 2
    nG = -(-nsweeps // g)
    S = b + g
    T = chase.HV.shape[1]
    HVv, HTv = wavefront_stores(chase, n, b, g)
    hvt = HVv.swapaxes(0, 1)
    htt = HTv.swapaxes(0, 1)
    jps = jax.jit(W._p_stream, static_argnums=(2, 3))
    for it in range(2):
        t0 = time.time()
        pst = jps(hvt, htt, g, b)
        sync(pst)
        t_ps = time.time() - t0
    gb = pst.size * 4 / 2 ** 30
    # kernel-only: call the full function but with the stream prebuilt —
    # monkeypatch _p_stream to return the cached stream (one phase fits
    # at 8192)
    orig = W._p_stream
    W._p_stream = lambda *a_, **k_: pst
    try:
        for it in range(2):
            t0 = time.time()
            zz = W.apply_chase_q_wavefront_pallas(chase, z0, bw, group=g)
            sync(zz)
            t_k = time.time() - t0
    finally:
        W._p_stream = orig
    # end-to-end for reference
    for it in range(2):
        t0 = time.time()
        zz = W.apply_chase_q_wavefront_pallas(chase, z0, bw, group=g)
        sync(zz)
        t_e2e = time.time() - t0
    print(json.dumps({"n": n, "g": g, "nG": nG, "S": S, "T": int(T),
                      "pstream_gb": round(gb, 2),
                      "t_pstream": round(t_ps, 3),
                      "t_kernel_only": round(t_k, 3),
                      "t_e2e": round(t_e2e, 3)}), flush=True)
    del pst, HVv, HTv, hvt, htt, zz
