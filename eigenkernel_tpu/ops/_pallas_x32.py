"""Trace-time x64 gating for Pallas kernels.

Under ``jax_enable_x64`` (the dtype='mixed' solve path) weak-typed
Python scalars inside kernel bodies canonicalize to int64/float64, and
Mosaic's convert_element_type lowering for 64-bit types mutually
recurses (`_convert_element_type_lowering_rule` <-> `lower_fun`) until
RecursionError — the r4 sweep's "eigensx mixed died" failure.

``kernel_trace_ctx(dtype)`` returns a context manager that disables
x64 while tracing a 32-bit kernel (strong-typed operands keep their
dtypes; only Python literals are canonicalized) and is a no-op for
64-bit kernels, which only run in interpret mode on CPU where Mosaic
is not involved — and where x64-off would silently truncate explicit
f64 constants to f32.
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp


def kernel_trace_ctx(dtype):
    if jnp.dtype(dtype).itemsize >= 8:
        return contextlib.nullcontext()
    return jax.enable_x64(False)
