"""Multi-host (multi-process) runtime: the MPI-world analog.

Reference parity: mpi_init / bcast of the COO matrices (main.f90:29,
distribute_matrix.f90:481-523) and the rank-0-reads-then-broadcasts input
pattern.  On TPU pods the equivalents are:

* ``init_distributed`` — ``jax.distributed.initialize()``: one Python
  process per host, all chips of the slice visible as ``jax.devices()``;
  intra-slice communication rides ICI, host coordination DCN.
* ``bcast_coo`` — process 0 reads the MatrixMarket file and broadcasts
  the O(nnz) COO triplets (``multihost_utils.broadcast_one_to_all``);
  each process then densifies only its own device shards
  (``parallel.mesh.distribute_coo``) — no process ever holds the full
  dense matrix.
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
    needed outside orchestrators that set the standard cluster env vars;
    the CLI passes them from EK_COORDINATOR / EK_NUM_PROCESSES /
    EK_PROCESS_ID (the mpirun-rank analog for CPU testing).
    """
    if coordinator_address is None and num_processes in (None, 1):
        return  # single-process run
    # NOTE: jax.process_count()/jax.devices() would initialize the backend
    # and make initialize() impossible — only is_initialized() is safe here
    try:
        if jax.distributed.is_initialized():
            return
    except AttributeError:
        pass
    try:
        # CPU multi-process collectives need the gloo transport
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def is_master() -> bool:
    """check_master analog: true on process 0."""
    return jax.process_index() == 0


_REPS = ("coordinate", "array")
_FIELDS = ("real", "integer", "pattern")
_SYMMS = ("general", "symmetric", "skew-symmetric")


def bcast_ok(ok: bool) -> bool:
    """Coherent error propagation from process 0 (main.f90:65-68 analog):
    everyone learns whether the master's read succeeded, so all processes
    terminate together instead of deadlocking in a later broadcast."""
    if jax.process_count() == 1:
        return ok
    from jax.experimental import multihost_utils

    flag = np.array([1 if ok else 0], np.int64)
    return bool(multihost_utils.broadcast_one_to_all(flag)[0])


def bcast_matrix_info(info):
    """bcast_matrix_info analog (command_argument.f90:106-118): process 0
    probed the MatrixMarket header; other hosts may not have the file.
    Returns None on every process when the master failed (info None)."""
    if jax.process_count() == 1:
        return info
    from jax.experimental import multihost_utils

    from eigenkernel_tpu.core.types import MatrixInfo

    if info is not None:
        vec = np.array([1, info.rows, info.cols, info.entries,
                        _REPS.index(info.rep), _FIELDS.index(info.field),
                        _SYMMS.index(info.symm)], np.int64)
    else:
        vec = np.zeros(7, np.int64)
    vec = np.asarray(multihost_utils.broadcast_one_to_all(vec))
    if vec[0] == 0:
        return None
    return MatrixInfo(rep=_REPS[int(vec[4])], field=_FIELDS[int(vec[5])],
                      symm=_SYMMS[int(vec[6])], rows=int(vec[1]),
                      cols=int(vec[2]), entries=int(vec[3]))


def bcast_coo(sp, size: int, entries: int):
    """Broadcast a COO matrix from process 0 (bcast_sparse_matrix analog,
    distribute_matrix.f90:481-523: the reference broadcasts the THREE COO
    triplet arrays, not the dense matrix).  DCN traffic is O(nnz); the
    dense matrix is only ever materialized shard-locally afterwards
    (:func:`eigenkernel_tpu.parallel.mesh.distribute_coo`).

    ``sp`` may be None on non-zero processes; ``size``/``entries`` come
    from the already-broadcast header info.
    """
    if jax.process_count() == 1:
        assert sp is not None
        return sp
    from jax.experimental import multihost_utils

    from eigenkernel_tpu.core.types import SparseMatrix

    if sp is not None:
        pack = np.stack([sp.rows.astype(np.float64),
                         sp.cols.astype(np.float64),
                         sp.values.astype(np.float64)])
    else:
        pack = np.zeros((3, entries), np.float64)
    pack = np.asarray(multihost_utils.broadcast_one_to_all(pack))
    return SparseMatrix(size=size, rows=pack[0].astype(np.int64),
                        cols=pack[1].astype(np.int64), values=pack[2])
