# Mosaic probe: does pltpu.roll with a TRACED (dynamic) shift lower and
# RUN on this TPU's compiler?  (The strided form fails remote compile —
# r5a chase_roll4k; the pre-sheared chase layout only needs the plain
# uniform dynamic rotate.)  Probes 2-D and 3-D operands and the
# roll-by-dynamic-amount-via-masked-static-rolls fallback for reference.
import os, time, json, sys
import jax, numpy as np, jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name, fn, x, ref):
    try:
        t0 = time.time()
        out = np.asarray(fn(x))
        dt = time.time() - t0
        err = float(np.abs(out - ref).max())
        print(json.dumps({"probe": name, "ok": err == 0.0,
                          "maxdiff": err, "s": round(dt, 2)}), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"probe": name,
                          "err": repr(e)[:200]}), flush=True)


G, R, L = 4, 64, 128
rng = np.random.default_rng(0)
x2 = rng.standard_normal((R, L)).astype(np.float32)
x3 = rng.standard_normal((G, R, L)).astype(np.float32)

# dynamic shift derived from program_id — same dependence the chase
# kernel would have (shift = base % b with base a function of pid)
def k2(x_ref, o_ref):
    s = pl.program_id(0) * 7 % 32 + 3
    o_ref[:, :] = pltpu.roll(x_ref[:, :], s, 1)


def k3(x_ref, o_ref):
    s = pl.program_id(0) * 7 % 32 + 3
    o_ref[:, :, :] = pltpu.roll(x_ref[:, :, :], s, 2)


def k3sub(x_ref, o_ref):
    # dynamic rotate along the SUBLANE axis (axis=1 of a 3-D block)
    s = pl.program_id(0) * 3 % 8 + 1
    o_ref[:, :, :] = pltpu.roll(x_ref[:, :, :], s, 1)


f2 = pl.pallas_call(k2, grid=(1,),
                    out_shape=jax.ShapeDtypeStruct((R, L), jnp.float32))
f3 = pl.pallas_call(k3, grid=(1,),
                    out_shape=jax.ShapeDtypeStruct((G, R, L), jnp.float32))
f3s = pl.pallas_call(k3sub, grid=(1,),
                     out_shape=jax.ShapeDtypeStruct((G, R, L), jnp.float32))

probe("dynroll_2d_lane", f2, jnp.asarray(x2), np.roll(x2, 3, axis=1))
probe("dynroll_3d_lane", f3, jnp.asarray(x3), np.roll(x3, 3, axis=2))
probe("dynroll_3d_sublane", f3s, jnp.asarray(x3), np.roll(x3, 1, axis=1))

# timing ladder: dynamic rotate vs 5-round masked static-roll network on
# a chase-sized operand (G=34, 2b=64 rows) — the per-step shear cost
Gc, Rc = 34, 64
xc = rng.standard_normal((Gc, Rc, L)).astype(np.float32)
ITERS = 2000


def kd(x_ref, o_ref):
    acc = x_ref[:, :, :]
    for i in range(8):
        s = (pl.program_id(0) * 7 + i) % 32 + 1
        acc = pltpu.roll(acc, s, 2)
    o_ref[:, :, :] = acc


def kn(x_ref, o_ref):
    acc = x_ref[:, :, :]
    rr = lax.broadcasted_iota(jnp.int32, (Rc, 1), 0)
    shear = 31 - (rr % 32)
    for i in range(8):
        out = acc
        amt = 1
        while amt <= 16:
            rolled = jnp.roll(out, amt, axis=-1)
            out = jnp.where((shear & amt) != 0, rolled, out)
            amt *= 2
        acc = out
    o_ref[:, :, :] = acc


def kp(x_ref, o_ref):
    # PER-LANE dynamic rotates (the shape the pre-sheared chase layout
    # actually needs: each lane's correction shift differs): G small
    # (R, L) rotates per iteration instead of one big one — measures
    # whether per-op overhead eats the round-count win
    for g in range(Gc):
        s = (pl.program_id(0) * 7 + g) % 32 + 1
        o_ref[g, :, :] = pltpu.roll(x_ref[g, :, :], s, 1)


for nm, kk in (("dyn", kd), ("net", kn), ("perlane", kp)):
    try:
        f = pl.pallas_call(kk, grid=(ITERS,),
                           out_shape=jax.ShapeDtypeStruct((Gc, Rc, L),
                                                          jnp.float32))
        xj = jnp.asarray(xc)
        r = f(xj); float(jnp.sum(r[0, 0, :2]))  # compile+run
        t0 = time.time()
        r = f(xj); float(jnp.sum(r[0, 0, :2]))
        dt = time.time() - t0
        print(json.dumps({"probe": f"shear8_{nm}_x{ITERS}",
                          "s": round(dt, 3),
                          "us_per_iter": round(dt / ITERS * 1e6, 2)}),
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"probe": f"shear8_{nm}", "err": repr(e)[:200]}),
              flush=True)
