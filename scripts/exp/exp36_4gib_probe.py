# Minimal repro ladder for the select32k worker crash (chain N/O: the
# TPU worker dies mid-tridiagonalize at n=32768, three clean attempts).
# Hypothesis under test: a (32768, 32768) f32 buffer is exactly 4 GiB =
# 2^32 bytes — if any generated kernel addresses it with 32-bit byte
# offsets, reads/writes past the 2^31/2^32 line fault the worker.  At
# n=24576 (2.25 GiB, > 2^31) the same tridiagonalize PASSES, so the
# suspect line is 2^32, not 2^31.
#
# Stages (each fetches a dependent scalar before the next starts, so the
# log shows exactly which stage kills the worker):
#   A  allocate 4 GiB zeros + reduce
#   B  static-offset elementwise update at the END of the buffer
#   C  dynamic_update_slice at a traced offset near the end (donated)
#   D  8-step mini-sytrd: panel GEMM + high-offset in-place update
import os, sys, time

import jax, jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

n = int(os.environ.get("N", "32768"))


def stage(name):
    print(f"[probe] {name} @ {time.strftime('%H:%M:%S')}", flush=True)


stage("A: alloc+reduce start")
x = jnp.zeros((n, n), jnp.float32)
print("  sum =", float(jnp.sum(x[n - 8:, n - 8:])), flush=True)
stage("A ok")

stage("B: static end-of-buffer update")
x = x.at[n - 8:, n - 1024:].add(1.0)
print("  sum =", float(jnp.sum(x[n - 8:, n - 8:])), flush=True)
stage("B ok")


@jax.jit
def dyn_update(a, i):
    blk = jnp.ones((8, 1024), jnp.float32) * 2.0
    return lax.dynamic_update_slice(a, blk, (i, i))


stage("C: dynamic_update_slice near end")
x = dyn_update(x, jnp.asarray(n - 1536, jnp.int32))
print("  sum =", float(jnp.sum(x[n - 8:, n - 8:])), flush=True)
stage("C ok")


@jax.jit
def mini_sytrd(a):
    def body(j, a):
        off = j * 128
        panel = lax.dynamic_slice(a, (0, off), (a.shape[0], 128))
        upd = panel @ (panel.T @ panel)  # (n,128) temp, touches all rows
        return lax.dynamic_update_slice(a, upd, (0, off))

    return lax.fori_loop(0, 8, body, a)


stage("D: mini-sytrd panel loop (donated)")
x = jax.jit(mini_sytrd, donate_argnums=0)(x)
print("  sum =", float(jnp.sum(x[n - 8:, n - 8:])), flush=True)
stage("D ok")
print("PROBE PASS n=%d" % n, flush=True)
