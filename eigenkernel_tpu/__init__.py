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
"""

from eigenkernel_tpu.version import VERSION

__version__ = VERSION

__all__ = ["VERSION"]
