"""Core value types: matrix headers, host-side COO matrices, eigenpairs.

Reference parity:
* ``MatrixInfo``   <- ``ek_matrix_info_t``      (command_argument.f90:13-18)
* ``SparseMatrix`` <- ``ek_sparse_mat_t``       (matrix_io.f90:11-15)
* ``EigenPairs``   <- ``ek_eigenpairs_types_union_t`` (eigenpairs_types.f90:2-17)

The reference distinguishes type-1 (replicated local) from type-2
(BLACS-distributed) eigenpairs.  On TPU both are the same jax array — the
difference is only the attached :class:`jax.sharding.Sharding` — so
``EigenPairs`` is a single type with a ``sharded`` flag carried for log
compatibility.  ``vectors[:, j]`` is the eigenvector of ``values[j]``
(ascending), exactly the reference's column convention.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

import numpy as np


@dataclass
class MatrixInfo:
    """MatrixMarket header: representation/field/symmetry + dimensions."""

    rep: str = "coordinate"  # 'coordinate' | 'array'
    field: str = "real"      # 'real' | 'integer' | 'pattern' (complex unsupported)
    symm: str = "symmetric"  # 'general' | 'symmetric' | 'skew-symmetric'
    rows: int = 0
    cols: int = 0
    entries: int = 0


@dataclass
class SparseMatrix:
    """Host-side COO matrix as read from a MatrixMarket file.

    Stores only the entries present in the file (lower triangle for
    symmetric MM files); ``to_dense`` symmetrizes, mirroring
    ``distribute_global_sparse_matrix`` (distribute_matrix.f90:401-422) which
    sets both (i,j) and (j,i) per nnz.
    Indices are 0-based here (the reference is 1-based Fortran).
    """

    size: int
    rows: np.ndarray   # int64[nnz], 0-based
    cols: np.ndarray   # int64[nnz], 0-based
    values: np.ndarray  # float64[nnz]

    @property
    def nnz(self) -> int:
        return int(self.values.shape[0])

    def to_dense(self, dtype=np.float64) -> np.ndarray:
        """Dense symmetric matrix with both triangles filled."""
        n = self.size
        a = np.zeros((n, n), dtype=dtype)
        a[self.rows, self.cols] = self.values.astype(dtype)
        off = self.rows != self.cols
        a[self.cols[off], self.rows[off]] = self.values[off].astype(dtype)
        return a


@dataclass
class EigenPairs:
    """Result of an eigensolve: ``values`` ascending, ``vectors[:, j]``.

    ``values``/``vectors`` are jax arrays (possibly sharded over the mesh).
    ``n_vec`` may be smaller than the matrix dimension for selecting solvers.
    """

    values: Any               # f[n_vec]
    vectors: Any              # f[n, n_vec]
    sharded: bool = False     # reference type_number: 1=local, 2=distributed
    meta: dict = field(default_factory=dict)

    @property
    def n_vec(self) -> int:
        return int(self.values.shape[0])

    @property
    def dim(self) -> int:
        return int(self.vectors.shape[0])

    @property
    def type_number(self) -> int:
        """Reference log-compat: 1 = replicated local, 2 = distributed."""
        return 2 if self.sharded else 1


@dataclass
class Problem:
    """An eigenproblem: standard (B is None) or generalized (B SPD)."""

    A: SparseMatrix
    B: Optional[SparseMatrix] = None

    @property
    def is_generalized(self) -> bool:
        return self.B is not None

    @property
    def dim(self) -> int:
        return self.A.size
