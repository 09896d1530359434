# First M=32768 datapoint: selecting lowest-500 via the ONE-stage core
# (the only configuration that fits 16 GB HBM single-chip — see
# evidence/BUDGET_32K_r5.md).  EK_SELECT_CORE=one_stage is required: the
# TPU default would route to the two-stage core, whose chase-store
# repack peaks ~17.4 GB at this size.
#
# v4 memory discipline (after the v2 compile OOM at 68 % fragmentation
# and the v3 runtime OOM): EK_SYTRD_DONATE=1 lets the tridiagonalize jit
# reuse the input buffer as its loop carry (-4 GB) — the device copy is
# DESTROYED by each solve, so the matrix is re-uploaded per iteration
# from the host copy (upload time excluded from the timed solve);
# the trailing rank-2b update row-blocks its (m, m) GEMM temp (-3.5 GB,
# EK_SYTRD_UPDATE_TEMP_MB default 1024).
import os, time, json, sys

os.environ.setdefault("EK_SELECT_CORE", "one_stage")
os.environ.setdefault("EK_SYTRD_DONATE", "1")
import jax, numpy as np, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")
from eigenkernel_tpu.solvers import solve
from eigenkernel_tpu.obs.events import EventLog
from eigenkernel_tpu.obs.mem import memstats

memstats("exp33:process_start", force=True)

n = int(os.environ.get("N", "32768"))
k = int(os.environ.get("K", "500"))
rng = np.random.default_rng(0)
a = rng.standard_normal((n, n), dtype=np.float32)
a += a.T.copy()
a *= 0.5

HOST_INPUT = os.environ.get("HOST_INPUT", "0") == "1"
p = None
for it in range(int(os.environ.get("REPEATS", "2"))):
    if p is not None:
        import gc
        p = None
        gc.collect()
    if HOST_INPUT:
        # padded runs (EK_FORCE_NPAD): hand solve() the HOST array so the
        # only device-resident copy is the padded one _pad_place builds —
        # a device input would add its own 4.3 GB next to the padded copy
        # (r5 chain-S runtime OOM at n_pad=32832)
        ad = a
    else:
        ad = jnp.asarray(a)  # ~4.3 GB upload; destroyed by the donated solve
        float(jnp.sum(ad[:1, :1]))
    memstats(f"exp33:after_upload_{it}", force=True)
    log = EventLog(stream=False)
    t0 = time.time()
    p = solve(ad, solver="scalapack_select", n_vec=k, log=log)
    s = float(jnp.sum(p.values) + jnp.sum(p.vectors[0, :8]))
    dt = time.time() - t0
    del ad
    stages = {e["name"]: round(e["val"], 3) for e in log.events()
              if not e["name"].startswith("!")}
    print(json.dumps({"iter": it, "n": n, "k": k,
                      "core": os.environ.get("EK_SELECT_CORE"),
                      "time_s": round(dt, 3), "stages": stages}),
          flush=True)
    memstats(f"exp33:after_solve_{it}", force=True)

# device-side residual on a strided 64-column subset (host fetch of
# (32768, 64) is ~8 MB — fine; the full block would be ~35 s/GB).
# The solve destroyed its upload, so bring the matrix back once.
cols = jnp.arange(0, k, max(1, k // 64))[:64]
V = p.vectors[:, cols]
w = p.values[cols]
ad = jnp.asarray(a)
r = ad @ V - V * w[None, :]
resid = float(jnp.max(jnp.abs(r)) / jnp.linalg.norm(ad))
print(json.dumps({"resid_max_64cols": float(f"{resid:.3e}")}), flush=True)
