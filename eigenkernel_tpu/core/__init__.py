from eigenkernel_tpu.core.types import (
    EigenPairs,
    MatrixInfo,
    Problem,
    SparseMatrix,
)

__all__ = ["EigenPairs", "MatrixInfo", "Problem", "SparseMatrix"]
