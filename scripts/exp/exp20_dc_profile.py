# D&C tridiagonal eigensolver cost at scale: tridiag_dc alone at N
# (one-stage@16k spends 1.07 s here; post-chase-fix it is ~25-30 % of
# the two-stage total).  A/Bs the EK_DC_ITERS secular iteration count —
# prints time + cross-config eigenvalue consistency.
import os, time, json, sys
import jax, numpy as np, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")
from eigenkernel_tpu.ops.dc import tridiag_dc

n = int(os.environ.get("N", "16384"))
rng = np.random.default_rng(0)
d = jnp.asarray(rng.standard_normal(n).astype(np.float32))
e = jnp.asarray(rng.standard_normal(n - 1).astype(np.float32))

w_ref = None
for iters in [int(x) for x in os.environ.get("ITERS", "30,25").split(",")]:
    f = jax.jit(lambda d, e: tridiag_dc(d, e, iters=iters))
    w, q = f(d, e)
    float(jnp.sum(w))  # compile+run
    t0 = time.time()
    w, q = f(d, e)
    s = float(jnp.sum(w) + jnp.sum(q[0, :8]))
    dt = time.time() - t0
    # residual of a strided column subset on device (d,e tridiag apply)
    qs = q[:, ::16]
    ws = w[::16]
    tv = d[:, None] * qs
    tv = tv.at[:-1, :].add(e[:, None] * qs[1:, :])
    tv = tv.at[1:, :].add(e[:, None] * qs[:-1, :])
    resid = float(jnp.max(jnp.abs(tv - qs * ws[None, :])))
    wmax = 0.0 if w_ref is None else float(jnp.max(jnp.abs(w - w_ref)))
    if w_ref is None:
        w_ref = w
    print(json.dumps({"n": n, "iters": iters, "time_s": round(dt, 3),
                      "resid_subset": float(f"{resid:.3e}"),
                      "w_maxdiff_vs_first": float(f"{wmax:.3e}")}),
          flush=True)
    jax.clear_caches()
