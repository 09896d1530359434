# TPU repro of the r4e sweep failure: eigensx dtype=mixed at n=2048
# died with "maximum recursion depth exceeded" (sweep swallowed the
# traceback).  Prints the most-recursed frames on failure.
import os
import sys
import traceback
from collections import Counter

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_enable_x64", True)
sys.path.insert(0, "/root/repo")

import numpy as np

from eigenkernel_tpu.solvers.api import solve

n = int(os.environ.get("N", "2048"))
rng = np.random.default_rng(0)
a = rng.standard_normal((n, n))
a = (a + a.T) / 2
import jax.numpy as jnp

ad = jnp.asarray(a)
try:
    p = solve(ad, solver="eigensx", dtype="mixed")
    v = np.asarray(jax.device_get(p.vectors[:, :8]))
    w = np.asarray(jax.device_get(p.values))
    r = a @ v - v * w[None, :8]
    print({"ok": True, "n": n,
           "resid8": float(np.abs(r).max() / np.linalg.norm(a))}, flush=True)
except RecursionError as e:
    tb = traceback.extract_tb(sys.exc_info()[2])
    c = Counter((f.filename.split("/")[-1], f.name) for f in tb)
    for k, cnt in c.most_common(10):
        print("FRAME", cnt, k, flush=True)
    print({"ok": False, "n": n, "error": str(e)}, flush=True)
