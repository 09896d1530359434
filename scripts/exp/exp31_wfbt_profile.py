# Profile the wf_bt v3 pipeline: where does the BT time at n=16384 go —
# the XLA Q-stream build (_q_stream: P compose + embed GEMMs, phased) or
# the pallas kernel lane loop?  Times each piece warm with dependent-
# scalar sync.  N/BW/GS via env; mirrors the in-pipeline v3 call
# (apply_chase_q_wavefront_pallas) by replaying its phase arithmetic.
import os, time, json
os.environ.setdefault("EK_TWOSTAGE_BW", os.environ.get("BW", "32"))
import jax, numpy as np, jax.numpy as jnp

if os.environ.get("PLAT"):
    jax.config.update("jax_platforms", os.environ["PLAT"])
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import sys
sys.path.insert(0, "/root/repo")
from eigenkernel_tpu.solvers.twostage import _j_to_band, _j_band_to_tridiag
from eigenkernel_tpu.ops import pallas_wf_bt as W
from eigenkernel_tpu.ops.bulge import group_stores

bw = int(os.environ.get("BW", "32"))
n = int(os.environ.get("N", "16384"))
rng = np.random.default_rng(0)


def sync(x):
    return float(jnp.sum(jnp.abs(x[:1, :1])))


a = rng.standard_normal((n, n)).astype(np.float32)
a = (a + a.T) / 2
ad = jnp.asarray(a)
with jax.default_matmul_precision("highest"):
    band_res = _j_to_band(ad, bw, None)
    chase = _j_band_to_tridiag(
        band_res.band, bw,
        "pallas" if jax.default_backend() == "tpu" else "wavefront2", None)
interp = jax.default_backend() != "tpu"
z0 = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
del ad, a

for g in [int(s) for s in os.environ.get("GS", "64").split(",")]:
    b = bw
    nsweeps = n - 2
    nG = -(-nsweeps // g)
    S = b + g
    T = chase.HV.shape[1]
    m = int(os.environ.get("EK_WF_BT_M", "0")) or max(1, (128 - S) // b + 1)
    m = max(1, min(m, T))
    S2 = g + m * b
    S2c = -(-S2 // 128) * 128
    Tm = -(-T // m)
    U = Tm + nG - 1           # composite taus (Tq2 in the module)
    isz = 4
    stream_budget = int(os.environ.get("EK_WF_BT_STREAM",
                                       str(int(2.2 * 2 ** 30))))
    stream_bytes = U * nG * S2 * S2c * isz
    nph = max(1, -(-stream_bytes // stream_budget))
    tc = -(-U // nph)

    hvu, htu = W._composite_views(*group_stores(chase, n, b, g), m, U)
    jqs = jax.jit(W._q_stream, static_argnums=(2, 3, 4))
    # warm + timed per-phase stream builds
    for it in range(2):
        t0 = time.time()
        tot_gb = 0.0
        for i in range(nph):
            pst = jqs(hvu[i * tc:(i + 1) * tc],
                      htu[i * tc:(i + 1) * tc], g, b, m)
            sync(pst)
            tot_gb += pst.size * 4 / 2 ** 30
        t_stream = time.time() - t0
    # end-to-end v3 BT (stream build + kernel, serial phases)
    for it in range(2):
        t0 = time.time()
        zz = W.apply_chase_q_wavefront_pallas(chase, z0, bw, group=g,
                                                  interpret=interp)
        sync(zz)
        t_e2e = time.time() - t0
    print(json.dumps({"n": n, "g": g, "m": m, "nG": nG, "U": int(U),
                      "phases": int(nph), "stream_gb": round(tot_gb, 2),
                      "t_stream": round(t_stream, 3),
                      "t_e2e": round(t_e2e, 3),
                      "t_kernel_approx": round(t_e2e - t_stream, 3)},
                     ), flush=True)
    del pst, zz
