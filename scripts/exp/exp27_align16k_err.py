# capture the FULL compile error for align-mode chase at 16k / G34
import os, traceback
os.environ["EK_PALLAS_CHASE_ALIGN"] = "1"
os.environ["EK_PALLAS_CHASE_GROUP"] = os.environ.get("G", "34")
os.environ.setdefault("EK_PALLAS_CHASE_VMEM", "24")
import jax, numpy as np, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import sys
sys.path.insert(0, "/root/repo")
from eigenkernel_tpu.ops.band import to_band
from eigenkernel_tpu.ops.pallas_chase import band_to_tridiag_pallas

n, bw = int(os.environ.get("N", "16384")), 32
rng = np.random.default_rng(0)
a = rng.standard_normal((n, n)).astype(np.float32)
a = (a + a.T) / 2
br = to_band(jnp.asarray(a), bw=bw)
try:
    res = band_to_tridiag_pallas(br.band, bw)
    print("OK", float(jnp.sum(jnp.abs(res.d))))
except Exception:
    traceback.print_exc()
    print("FAILED (full traceback above)")
