# Microbench: per-iteration latency floor of the wf_bt-v2 inner pattern
# (dynamic 8-aligned row slice + (S,128)@(128,TK) GEMM + store) on a
# resident VMEM z tile.  Decides whether the VMEM-tile wavefront BT can
# beat the XLA wavefront: the kernel does ITERS iterations; report
# us/iter for several TK and precision choices.
import os, time, json, sys, functools
import jax, numpy as np, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")

S = int(os.environ.get("S", "96"))
ROWS = int(os.environ.get("ROWS", "8448"))
ITERS = int(os.environ.get("ITERS", "8192"))


def kern(p_ref, zin_ref, zout_ref, *, tk, iters, prec, aligned):
    zout_ref[...] = zin_ref[...]
    nslots = (ROWS - 128) // 8

    def body(i, carry):
        if aligned:
            r0 = pl.multiple_of((i * 8) % (nslots * 8), 8)
        else:
            r0 = (i * 7) % (ROWS - 129)
        pg = p_ref[pl.ds((i % 64) * S, S), :]          # (S, 128)
        zw = zout_ref[pl.ds(r0, 128), :]               # (128, TK)
        upd = lax.dot_general(pg, zw, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=prec)
        zout_ref[pl.ds(r0, S), :] = upd[:S].astype(zout_ref.dtype)
        return carry

    lax.fori_loop(0, iters, body, 0)


for tk in [int(x) for x in os.environ.get("TKS", "128,512").split(",")]:
    for prec_name in os.environ.get("PRECS", "highest,high").split(","):
        for aligned in (True, False):
            prec = dict(highest=lax.Precision.HIGHEST,
                        high=lax.Precision.HIGH)[prec_name]
            p = jnp.asarray(np.random.default_rng(0).standard_normal(
                (64 * S, 128)).astype(np.float32)) * 0.01
            z = jnp.asarray(np.random.default_rng(1).standard_normal(
                (ROWS, tk)).astype(np.float32))
            f = pl.pallas_call(
                functools.partial(kern, tk=tk, iters=ITERS, prec=prec,
                                  aligned=aligned),
                out_shape=jax.ShapeDtypeStruct((ROWS, tk), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 2 ** 20),
                interpret=bool(os.environ.get("EK_INTERP")),
            )
            try:
                r = f(p, z)
                float(jnp.sum(r[:1, :1]))
                t0 = time.time()
                r = f(p, z)
                float(jnp.sum(r[:1, :1]))
                dt = time.time() - t0
                print(json.dumps({"tk": tk, "prec": prec_name,
                                  "aligned": aligned, "iters": ITERS,
                                  "us_per_iter":
                                  round(dt / ITERS * 1e6, 3)}),
                      flush=True)
            except Exception as exc:
                print(json.dumps({"tk": tk, "prec": prec_name,
                                  "aligned": aligned,
                                  "err": repr(exc)[:200]}), flush=True)
