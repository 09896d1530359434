"""fused_solver / __graft_entry__ smoke tests (CPU)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def test_fused_solver_jits_standard():
    from eigenkernel_tpu.solvers.api import fused_solver

    n = 64
    rng = np.random.default_rng(0)
    a = rng.standard_normal((n, n))
    a = (a + a.T) / 2
    fn = jax.jit(fused_solver("scalapack", n=n, block_size=16))
    w, v = fn(jnp.asarray(a))
    wref = np.linalg.eigvalsh(a)
    assert np.abs(np.array(w) - wref).max() < 1e-10


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    w, v = jax.jit(fn)(*args)
    assert w.shape[0] == args[0].shape[0]
    wh = np.array(w)
    assert (np.diff(wh) >= -1e-3).all()


def test_dryrun_multichip(monkeypatch):
    import __graft_entry__ as ge

    # the driver runs the registry sweep at n=256; keep the suite's copy
    # small (same code path, smaller shapes)
    monkeypatch.setenv("EK_DRYRUN_N", "64")
    ge.dryrun_multichip(8)
