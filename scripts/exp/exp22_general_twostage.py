# Generalized two-stage (general_elpa2) at scale: reduce (blocked
# cholesky + invert/trsm GEMMs) + SEP core + recover, per-stage times.
# The flagship pipeline (solver_elpa.f90:448 analog) measured beyond the
# n=4096 sweeps.
import os, time, json, sys
import jax, numpy as np, jax.numpy as jnp
if os.environ.get("PLAT"):      # PLAT=cpu for off-TPU smoke tests
    jax.config.update("jax_platforms", os.environ["PLAT"])
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")
from eigenkernel_tpu.solvers import solve
from eigenkernel_tpu.obs.events import EventLog

n = int(os.environ.get("N", "8192"))
solver = os.environ.get("SOLVER", "general_elpa2")
rng = np.random.default_rng(0)
a = rng.standard_normal((n, n)).astype(np.float32)
a = (a + a.T) / 2
# well-conditioned SPD B (diagonally dominant)
b = rng.standard_normal((n, n)).astype(np.float32) * 0.1
b = (b + b.T) / 2 + np.diag(np.full(n, float(n) ** 0.5, np.float32))

ad = jnp.asarray(a)
bd = jnp.asarray(b)
for it in range(2):
    log = EventLog(stream=False)
    t0 = time.time()
    p = solve(ad, b=bd, solver=solver, log=log)
    s = float(jnp.sum(p.values) + jnp.sum(p.vectors[0, :8]))
    dt = time.time() - t0
    stages = {e["name"]: round(e["val"], 3) for e in log.events()
              if not e["name"].startswith("!")}
    print(json.dumps({"iter": it, "n": n, "solver": solver,
                      "time_s": round(dt, 3), "stages": stages}),
          flush=True)
    if it == 0:
        import gc
        p = None  # free iter-0 eigenpairs (HBM headroom)
        gc.collect()
# generalized residual on a few columns: A V = B V diag(w)
V = np.asarray(jax.device_get(p.vectors[:, :64])).astype(np.float64)
w = np.asarray(jax.device_get(p.values[:64])).astype(np.float64)
r = a.astype(np.float64) @ V - (b.astype(np.float64) @ V) * w[None, :]
print("gen_resid_max(64 cols)/||A||_F:",
      float(np.abs(r).max() / np.linalg.norm(a)))
