from eigenkernel_tpu.ops.blocked import (
    blocked_cholesky,
    invert_lower_triangular,
    symmetrize,
    trsm_lower,
    trsm_right_lower_t,
)
from eigenkernel_tpu.ops.householder import (
    TridiagResult,
    apply_q,
    tridiag_matrix,
    tridiagonalize,
)
from eigenkernel_tpu.ops.reduction import (
    Reduction,
    recover,
    reduce_elpa,
    reduce_scalapack,
)
from eigenkernel_tpu.ops.tridiag import (
    bisect_eigenvalues,
    cholqr2,
    tridiag_eigh,
    tridiag_solve_shifted,
)

__all__ = [
    "blocked_cholesky",
    "invert_lower_triangular",
    "symmetrize",
    "trsm_lower",
    "trsm_right_lower_t",
    "TridiagResult",
    "apply_q",
    "tridiag_matrix",
    "tridiagonalize",
    "Reduction",
    "recover",
    "reduce_elpa",
    "reduce_scalapack",
    "bisect_eigenvalues",
    "cholqr2",
    "tridiag_eigh",
    "tridiag_solve_shifted",
]
