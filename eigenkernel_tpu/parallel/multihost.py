"""Multi-host (multi-process) runtime: the MPI-world analog.

Reference parity: mpi_init / bcast of the COO matrices (main.f90:29,
distribute_matrix.f90:481-523) and the rank-0-reads-then-broadcasts input
pattern.  On TPU pods the equivalents are:

* ``init_distributed`` — ``jax.distributed.initialize()``: one Python
  process per host, all chips of the slice visible as ``jax.devices()``;
  intra-slice communication rides ICI, host coordination DCN.
* ``broadcast_from_host0`` — process 0 reads the MatrixMarket file and
  broadcasts the dense array to every process
  (``multihost_utils.broadcast_one_to_all``), after which ``device_put``
  with a global 2D sharding places each shard on its owner chip.
* ``is_master`` — ``check_master`` analog (processes.f90:110-119).

Single-process runs (this repo's CI and the one-chip bench) short-circuit:
every helper degrades to a no-op so the same CLI code path works anywhere.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize the multi-process runtime (mpi_init analog).

    No-op when single-process or already initialized.  Arguments are only
    needed outside orchestrators that set the standard cluster env vars.
    """
    if jax.process_count() > 1:
        return  # already initialized by the runtime
    if coordinator_address is None and num_processes in (None, 1):
        return  # single-process run
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def is_master() -> bool:
    """check_master analog: true on process 0."""
    return jax.process_index() == 0


def broadcast_from_host0(x: Optional[np.ndarray], shape, dtype) -> np.ndarray:
    """Replicate host data from process 0 to all processes
    (bcast_sparse_matrix analog; DCN traffic, once per input).

    ``x`` may be None on non-zero processes.
    """
    if jax.process_count() == 1:
        assert x is not None
        return np.asarray(x)
    from jax.experimental import multihost_utils

    if x is None:
        x = np.zeros(shape, dtype)
    return np.asarray(multihost_utils.broadcast_one_to_all(
        np.asarray(x, dtype=dtype)))
