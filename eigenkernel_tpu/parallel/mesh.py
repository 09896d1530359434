"""Device mesh = the BLACS process grid, the TPU way.

Reference parity: processes.f90 + the descriptor machinery of
distribute_matrix.f90.

* ``layout_grid``   <- ``layout_procs`` (processes.f90:56-65): near-square
  ``P = Pr x Pc`` factorization with ``Pr <= Pc``.
* ``make_mesh``     <- ``setup_distribution`` (processes.f90:17-36): builds a
  2D :class:`jax.sharding.Mesh` with axes ``('r', 'c')`` over the ICI slice.
  Unlike BLACS there are no out-of-grid ranks to exclude: the factorization
  always uses every device.
* ``print_grid_mapping`` <- ``print_map_of_grid_to_processes``
  (processes.f90:68-107).
* ``distribute`` / ``gather`` <- ``distribute_global_sparse_matrix`` /
  ``gather_matrix`` (distribute_matrix.f90:401-422, 185-258).  Instead of
  per-nnz ``pdelset`` calls into block-cyclic local tiles, the host builds
  the dense (padded) matrix once and ``jax.device_put``s it with a 2D
  ``NamedSharding`` — the descriptor array is replaced by the sharding.

Block-cyclic vs plain block: ScaLAPACK needs cyclic wrapping for load balance
because its panel algorithms park work on single process columns.  XLA GSPMD
prefers plain 2D block sharding; load balance of the shrinking trailing
updates is handled by the compiler's collective scheduling, so we use plain
blocks (one canonical layout; no ``pdgemr2d`` analog is needed — see
SURVEY.md §2.3).
"""

from __future__ import annotations

import math
import sys
from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def layout_grid(n_procs: int) -> tuple[int, int]:
    """Near-square factorization ``n = r * c`` with ``r <= c``.

    Mirrors layout_procs (processes.f90:56-65): r is the largest divisor of
    ``n_procs`` not exceeding sqrt(n_procs).
    """
    r = int(math.isqrt(n_procs))
    while r > 1 and n_procs % r != 0:
        r -= 1
    return r, n_procs // r


def make_mesh(shape: Optional[tuple[int, int]] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Create the 2D ``('r','c')`` device mesh (setup_distribution analog)."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = layout_grid(len(devices))
    r, c = shape
    if r * c != len(devices):
        raise ValueError(
            f"mesh shape {shape} does not match device count {len(devices)}")
    dev_array = np.array(devices).reshape(r, c)
    return Mesh(dev_array, ("r", "c"))


def single_device_mesh() -> Mesh:
    return Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("r", "c"))


def mat_spec() -> P:
    """Partition spec of a 2D-sharded matrix over the grid."""
    return P("r", "c")


def mat_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, mat_spec())


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def colvec_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding of an (n, k) eigenvector block: rows over 'r', cols over 'c'."""
    return NamedSharding(mesh, P("r", "c"))


def pad_to(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple


def padded_dim(n: int, mesh: Mesh, block: int) -> int:
    """Padded matrix dimension: divisible by the block size and both mesh axes
    (so every blocked slice and every device shard has a static, equal shape —
    the analog of the reference clamping block sizes to fit the grid,
    distribute_matrix.f90:113-120)."""
    r, c = mesh.devices.shape
    return pad_to(n, math.lcm(block, r, c))


def distribute(host_mat: np.ndarray, mesh: Mesh,
               sharding: Optional[NamedSharding] = None) -> jax.Array:
    """Place a host matrix on the mesh with 2D block sharding.

    The analog of COO bcast + per-nnz pdelset scatter
    (distribute_matrix.f90:481-523, 401-422): one ``device_put`` with a
    sharding; per-device slices travel host->device directly.
    """
    sharding = sharding or mat_sharding(mesh)
    return jax.device_put(host_mat, sharding)


def distribute_coo(coo, mesh: Optional[Mesh], dtype,
                   sharding: Optional[NamedSharding] = None) -> jax.Array:
    """Shard-local densify of a COO matrix onto the mesh.

    The analog of distribute_global_sparse_matrix's per-nnz pdelset scatter
    into block-cyclic local tiles (distribute_matrix.f90:401-422): each
    process builds ONLY its addressable (n/r, n/c) dense shards from the
    (already broadcast) triplets — no process materializes the full dense
    matrix, which is what makes M=32k multi-host input feasible
    (O(n^2/P) per device instead of O(n^2) per host).

    Symmetrizes off-diagonal entries like the reference (both (i,j) and
    (j,i) are set per nnz, distribute_matrix.f90:415-417).

    The returned array is zero-padded up to the next mesh-divisible
    dimension (shardings must tile evenly); pass the logical ``n`` to
    ``solve(..., n_logical=n)`` downstream.
    """
    n = coo.size
    if mesh is None:
        return jax.device_put(coo.to_dense(dtype))
    sharding = sharding or mat_sharding(mesh)
    r, c = mesh.devices.shape
    n_m = pad_to(n, math.lcm(r, c))
    off = coo.rows != coo.cols
    r_all = np.concatenate([coo.rows, coo.cols[off]])
    c_all = np.concatenate([coo.cols, coo.rows[off]])
    v_all = np.concatenate([coo.values, coo.values[off]]).astype(dtype)

    def cb(index):
        rs, cs = index
        r0 = rs.start or 0
        r1 = n_m if rs.stop is None else rs.stop
        c0 = cs.start or 0
        c1 = n_m if cs.stop is None else cs.stop
        blk = np.zeros((r1 - r0, c1 - c0), dtype)
        m = (r_all >= r0) & (r_all < r1) & (c_all >= c0) & (c_all < c1)
        blk[r_all[m] - r0, c_all[m] - c0] = v_all[m]
        return blk

    return jax.make_array_from_callback((n_m, n_m), sharding, cb)


def gather(x: jax.Array) -> np.ndarray:
    """Fetch a (possibly sharded) device array back to the host
    (gather_matrix analog, distribute_matrix.f90:185-258)."""
    return np.asarray(jax.device_get(x))


def print_grid_mapping(mesh: Mesh, file=None) -> None:
    """Print device id per (row, col) grid coordinate
    (print_map_of_grid_to_processes analog, processes.f90:68-107)."""
    file = file or sys.stdout
    r, c = mesh.devices.shape
    print(f"Grid mapping: {r} x {c} devices", file=file)
    header = "        " + " ".join(f"col{j:4d}" for j in range(c))
    print(header, file=file)
    for i in range(r):
        row = " ".join(f"{mesh.devices[i, j].id:7d}" for j in range(c))
        print(f"row{i:4d} {row}", file=file)
