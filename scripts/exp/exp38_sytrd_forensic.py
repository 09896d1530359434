# Forensic host-stepped sytrd for the (28672, 32640] worker-crash wall
# (chains L/N/O/S: the one-jit donated tridiagonalize hard-crashes the
# TPU worker at n=32640/32768/32832, passes at 24576/28672; upload and
# primitive 4 GiB ops all pass, so the trigger is inside the program).
#
# This runs the IDENTICAL level-0 panel computation (same inner
# Householder fori, same matvecs, same row-blocked rank-2b update, same
# vstore write) as ONE jit per panel with a TRACED panel index — one
# executable, a host barrier between panels.  Whatever panel index the
# worker dies at localizes the trigger; VSTORE=0 drops the (n, n)
# reflector store from the carry to A/B the two-big-buffers factor.
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")
from eigenkernel_tpu.ops.householder import _householder, _rank2b_update

N = int(os.environ.get("N", "32640"))
B = 64
NPANELS = int(os.environ.get("NPANELS", "16"))
VSTORE = os.environ.get("VSTORE", "1") == "1"

m = N
dtype = jnp.float32


def panel(p, a, d, e, taus, vstore):
    rows = lax.broadcasted_iota(jnp.int32, (m,), 0)
    rows_e = lax.broadcasted_iota(jnp.int32, (e.shape[0],), 0)
    s = p * B

    def panel_step(j, inner):
        V, W, d, e, taus = inner
        c = s + j
        a_col = lax.dynamic_slice(a, (0, c), (m, 1))[:, 0]
        w_row = lax.dynamic_slice(W, (c, 0), (1, B))[0]
        v_row = lax.dynamic_slice(V, (c, 0), (1, B))[0]
        a_col = a_col - V @ w_row - W @ v_row
        d = lax.dynamic_update_slice(d, a_col[c][None], (c,))
        pivot = c + 1
        tail = jnp.where(rows > pivot, a_col, 0.0)
        alpha = lax.dynamic_slice(a_col, (jnp.minimum(pivot, m - 1),),
                                  (1,))[0]
        v, tau, beta = _householder(tail, alpha, pivot, m)
        live = c < m - 1
        tau = jnp.where(live, tau, 0.0)
        v = jnp.where(live, v, 0.0)
        e = jnp.where((rows_e == c) & live, beta, e)
        taus = lax.dynamic_update_slice(taus, tau[None], (c,))
        av = a @ v
        av = av - V @ (W.T @ v) - W @ (V.T @ v)
        w = tau * jnp.where(rows >= pivot, av, 0.0)
        w = w - (0.5 * tau * (w @ v)) * v
        V = lax.dynamic_update_slice(V, v[:, None], (0, j))
        W = lax.dynamic_update_slice(W, w[:, None], (0, j))
        return (V, W, d, e, taus)

    V0 = jnp.zeros((m, B), dtype)
    W0 = jnp.zeros((m, B), dtype)
    V, W, d, e, taus = lax.fori_loop(0, B, panel_step,
                                     (V0, W0, d, e, taus))
    vw = jnp.concatenate([V, W], axis=1)
    wv = jnp.concatenate([W, V], axis=1)
    a = _rank2b_update(a, vw, wv)
    if VSTORE:
        vstore = lax.dynamic_update_slice(vstore, V, (0, s))
    return a, d, e, taus, vstore


jpanel = jax.jit(panel, donate_argnums=(1, 2, 3, 4, 5))

print(f"[exp38] n={N} npanels={NPANELS} vstore={VSTORE} "
      f"gen @ {time.strftime('%H:%M:%S')}", flush=True)
rng = np.random.default_rng(0)
ah = rng.standard_normal((m, m), dtype=np.float32)
ah += ah.T.copy()
a = jnp.asarray(ah)
del ah
float(jnp.sum(a[:1, :1]))
print(f"[exp38] upload done @ {time.strftime('%H:%M:%S')}", flush=True)

d = jnp.zeros((m,), dtype)
e = jnp.zeros((m - 1,), dtype)
taus = jnp.zeros((m,), dtype)
vs = jnp.zeros((m, m) if VSTORE else (8, 8), dtype)

for p in range(NPANELS):
    t0 = time.time()
    a, d, e, taus, vs = jpanel(jnp.int32(p), a, d, e, taus, vs)
    dp = float(d[p * B])  # dependent scalar: barrier for THIS panel
    print(f"[panel {p:3d}] d[{p * B}]={dp:+.3e} dt={time.time() - t0:6.1f}s",
          flush=True)

print(f"EXP38 PASS n={N} panels={NPANELS} vstore={VSTORE}", flush=True)
