"""Mesh load-balance / communication evidence (VERDICT r2 #7).

Quantifies, on the 8-device virtual CPU mesh, what the plain-block
(non-cyclic) sharding of the recursive-bisection kernels costs:

* per-stage wall-clock, 8-device mesh vs single device (same host CPU —
  the mesh run uses the same cores, so sharded/replicated overhead and
  collective scheduling show up directly);
* compiled-HLO collective inventory per stage (op counts + bytes moved) —
  hardware-independent evidence of the ICI traffic the GSPMD partitioner
  emits for each kernel.

Usage: python scripts/mesh_balance.py [n] (default 2048); writes a
markdown table to stdout (redirect into evidence/).
"""

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

COLL_RE = re.compile(
    r"(all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)"
    r"[^=]*= \(?([a-z0-9]+)\[([0-9,]*)\]")

DTYPE_BYTES = {"f32": 4, "f64": 8, "bf16": 2, "s32": 4, "u32": 4, "pred": 1,
               "s64": 8, "u64": 8, "f16": 2, "s8": 1, "u8": 1}


def collective_stats(compiled_text: str):
    stats = {}
    for m in COLL_RE.finditer(compiled_text):
        op, dt, shape = m.group(1), m.group(2), m.group(3)
        elems = 1
        for s in shape.split(","):
            if s:
                elems *= int(s)
        byt = elems * DTYPE_BYTES.get(dt, 4)
        cnt, tot = stats.get(op, (0, 0))
        stats[op] = (cnt + 1, tot + byt)
    return stats


def time_fn(fn, *args, reps=2):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e30
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    return best, out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    from eigenkernel_tpu.ops import band as bandlib
    from eigenkernel_tpu.ops import blocked, householder
    from eigenkernel_tpu.parallel import make_mesh, mat_sharding
    from functools import partial

    mesh = make_mesh((2, 4))
    rng = np.random.default_rng(0)
    a = rng.standard_normal((n, n)).astype(np.float32)
    a = a + a.T
    spd = (a @ a.T / n + np.eye(n, dtype=np.float32) * n).astype(np.float32)

    stages = {
        "cholesky(block=256)": (
            lambda m: partial(blocked.blocked_cholesky, block=256, mesh=m),
            spd),
        "invert_triangular": (
            lambda m: partial(blocked.invert_lower_triangular, block=256,
                              mesh=m),
            np.linalg.cholesky(spd).astype(np.float32)),
        "tridiagonalize(panel=64)": (
            lambda m: partial(householder.tridiagonalize, block=64, mesh=m),
            a),
        "to_band(bw=64)": (
            lambda m: partial(bandlib.to_band, bw=64, mesh=m),
            a),
    }

    print(f"# Mesh balance at n={n}, f32, virtual 2x4 CPU mesh\n")
    print("| stage | 1-dev s | 8-dev s | ratio | collectives "
          "(op: count, MB) |")
    print("|---|---|---|---|---|")
    for name, (mk, operand) in stages.items():
        row = {}
        for tag, m in (("1dev", None), ("mesh", mesh)):
            fn = jax.jit(lambda x, f=mk(m): f(x))
            x = jnp.asarray(operand)
            if m is not None:
                x = jax.device_put(x, mat_sharding(m))
            with jax.default_matmul_precision("highest"):
                t, _ = time_fn(fn, x)
                txt = fn.lower(x).compile().as_text()
            row[tag] = (t, collective_stats(txt))
        t1, _ = row["1dev"]
        t8, coll = row["mesh"]
        coll_txt = "; ".join(
            f"{op}: {c}x, {b / 2**20:.1f}MB" for op, (c, b) in
            sorted(coll.items())) or "none"
        print(f"| {name} | {t1:.3f} | {t8:.3f} | {t1 / t8:.2f} | "
              f"{coll_txt} |")


if __name__ == "__main__":
    main()
