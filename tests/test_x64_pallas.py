"""No 64-bit values may reach a Pallas kernel jaxpr.

Under ``jax_enable_x64`` (the dtype='mixed' solve path), weak-typed
Python scalars canonicalize to int64/float64.  Mosaic's
convert_element_type lowering for 64-bit types mutually recurses
(`_convert_element_type_lowering_rule` <-> `lower_fun`) until Python's
recursion limit — the r4 sweep's "eigensx mixed died with
RecursionError".  This walks the jaxpr of every Pallas entry point with
f32 operands under x64 and asserts the kernel bodies stay 64-bit-free.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

BAD = ("float64", "int64", "uint64")


def _collect_pallas_kernels(jx, out):
    for eqn in jx.eqns:
        if eqn.primitive.name == "pallas_call":
            out.append(eqn.params["jaxpr"])
        for pval in eqn.params.values():
            if hasattr(pval, "jaxpr"):
                _collect_pallas_kernels(pval.jaxpr, out)
            elif hasattr(pval, "eqns"):
                _collect_pallas_kernels(pval, out)


def _bad_eqns(jx, out, path=""):
    for eqn in jx.eqns:
        for v in list(eqn.invars) + list(eqn.outvars):
            aval = getattr(v, "aval", None)
            if aval is not None and hasattr(aval, "dtype") and \
                    str(aval.dtype) in BAD:
                src = eqn.source_info.traceback
                frames = [f for f in (src.frames if src else [])
                          if "eigenkernel_tpu" in f.file_name][:1]
                loc = ";".join(f"{f.file_name.split('/')[-1]}:{f.line_num}"
                               for f in frames)
                out.append(f"{path}{eqn.primitive.name} "
                           f"in={[str(x.aval) for x in eqn.invars]} "
                           f"out={[str(x.aval) for x in eqn.outvars]} "
                           f"@{loc}")
                break
        for pval in eqn.params.values():
            if hasattr(pval, "jaxpr"):
                _bad_eqns(pval.jaxpr, out, path + eqn.primitive.name + "/")
            elif hasattr(pval, "eqns"):
                _bad_eqns(pval, out, path + eqn.primitive.name + "/")


def _assert_kernels_64bit_free(fn, *args, expect_kernels=1):
    with jax.enable_x64(True):
        jaxpr = jax.make_jaxpr(fn)(*args)
    kernels = []
    _collect_pallas_kernels(jaxpr.jaxpr, kernels)
    assert len(kernels) >= expect_kernels, \
        f"expected >= {expect_kernels} pallas_call, found {len(kernels)}"
    bad = []
    for k in kernels:
        _bad_eqns(k, bad)
    assert not bad, "64-bit ops inside pallas kernels:\n" + "\n".join(bad)


def _band(n, bw, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((n, n)).astype(np.float32)
    a = (a + a.T) / 2
    i, j = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    return jnp.asarray(np.where(np.abs(i - j) <= bw, a, 0.0), jnp.float32)


def test_chase_kernel_x64_free():
    from eigenkernel_tpu.ops.pallas_chase import band_to_tridiag_pallas

    band = _band(256, 32)
    _assert_kernels_64bit_free(
        lambda x: band_to_tridiag_pallas(x, 32, interpret=True), band)


def test_wf_bt_kernel_x64_free():
    from eigenkernel_tpu.ops.bulge import band_to_tridiag
    from eigenkernel_tpu.ops.pallas_wf_bt import \
        apply_chase_q_wavefront_pallas

    n, bw = 256, 32
    res = band_to_tridiag(_band(n, bw), bw)
    z = jnp.asarray(np.random.default_rng(1)
                    .standard_normal((n, 128)).astype(np.float32))
    _assert_kernels_64bit_free(
        lambda r, zz: apply_chase_q_wavefront_pallas(r, zz, bw, group=32,
                                                     interpret=True),
        res, z)


def test_chase_bt_kernel_x64_free():
    from eigenkernel_tpu.ops.bulge import band_to_tridiag
    from eigenkernel_tpu.ops.pallas_backtransform import apply_chase_q_pallas

    n, bw = 128, 8
    res = band_to_tridiag(_band(n, bw), bw)
    z = jnp.asarray(np.random.default_rng(2)
                    .standard_normal((n, 32)).astype(np.float32))
    _assert_kernels_64bit_free(
        lambda r, zz: apply_chase_q_pallas(r.HV, r.HT, zz, bw,
                                           interpret=True),
        res, z)


def test_sturm_solve_kernels_x64_free():
    from eigenkernel_tpu.ops.pallas_solve import tridiag_solve_pallas
    from eigenkernel_tpu.ops.pallas_sturm import sturm_bisect
    from eigenkernel_tpu.ops.tridiag import gershgorin_bounds

    rng = np.random.default_rng(3)
    n, k = 160, 8
    d = jnp.asarray(rng.standard_normal(n), jnp.float32)
    e = jnp.asarray(rng.standard_normal(n - 1), jnp.float32)
    lo, hi = gershgorin_bounds(d, e)
    lo32 = jnp.asarray(lo, jnp.float32)
    hi32 = jnp.asarray(hi, jnp.float32)
    idx = jnp.arange(k, dtype=jnp.int32)
    _assert_kernels_64bit_free(
        lambda *a: sturm_bisect(*a, interpret=True), d, e, idx, lo32, hi32)

    lam = jnp.asarray(rng.standard_normal(k) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((n, k)), jnp.float32)
    _assert_kernels_64bit_free(
        lambda *a: tridiag_solve_pallas(*a, interpret=True), d, e, lam, b)
