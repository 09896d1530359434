"""EigenKernel-TPU — a TPU-native dense real-symmetric eigensolver framework.

A from-scratch rebuild of the capabilities of `eigenkernel/eigenkernel`
(a Fortran/MPI/ScaLAPACK+ELPA+EigenExa hybrid-solver middleware) as an
idiomatic JAX/XLA/Pallas framework:

* standard ``A x = lambda x`` and generalized ``A x = lambda B x`` problems
  (A symmetric, B symmetric positive definite),
* a *solver zoo* behind one registry (``-s <name>``), where each named solver
  is a pipeline combining a generalized->standard reduction strategy with a
  symmetric-eigenproblem (SEP) core and a back-transformation,
* MatrixMarket IO, eigenvalue/ipratio/eigenvector writers,
* residual / orthogonality verifiers,
* an accumulating event logger with a ``log.json`` schema identical to the
  reference's, so runs are comparable.

Parallelism is expressed the TPU way: one ``jax.sharding.Mesh`` with a 2D
``('r', 'c')`` process grid (the BLACS-grid analog, processes.f90:17-36),
plain 2D block shardings instead of block-cyclic descriptors, and XLA
collectives emitted by ``jit``/``shard_map`` instead of MPI/BLACS calls.

This module re-exports the public API (the ``module eigenkernel`` umbrella
analog, modules.f90:1-13) for embedding the library in other applications.
"""

from eigenkernel_tpu.version import VERSION

__version__ = VERSION


def __getattr__(name):
    # Lazy re-exports: importing eigenkernel_tpu must stay cheap (no jax).
    if name in ("solve", "fused_solver"):
        from eigenkernel_tpu.solvers import api
        return getattr(api, name)
    if name in ("SOLVERS", "get_spec", "solver_names"):
        from eigenkernel_tpu.solvers import registry
        return getattr(registry, name)
    if name in ("read_header", "read_matrix", "write_matrix"):
        from eigenkernel_tpu.io import matrix_market
        return getattr(matrix_market, name)
    if name in ("EigenPairs", "Problem", "SparseMatrix", "MatrixInfo"):
        from eigenkernel_tpu.core import types
        return getattr(types, name)
    if name in ("eval_residual_norm", "eval_orthogonality", "get_ipratios"):
        from eigenkernel_tpu.verify import verifier
        return getattr(verifier, name)
    if name in ("make_mesh", "layout_grid"):
        from eigenkernel_tpu.parallel import mesh
        return getattr(mesh, name)
    if name == "EventLog":
        from eigenkernel_tpu.obs import events
        return events.EventLog
    raise AttributeError(f"module 'eigenkernel_tpu' has no attribute {name!r}")


__all__ = [
    "VERSION",
    "solve", "fused_solver", "SOLVERS", "get_spec", "solver_names",
    "read_header", "read_matrix", "write_matrix",
    "EigenPairs", "Problem", "SparseMatrix", "MatrixInfo",
    "eval_residual_norm", "eval_orthogonality", "get_ipratios",
    "make_mesh", "layout_grid", "EventLog",
]
