"""eigenkernel_app — the end-to-end CLI driver (main.f90 analog).

Same run shape and event names as the reference ``program eigbench``:

  parse args -> probe headers -> validate -> read MM files -> place on
  devices -> solve -> write eigenvalues.dat -> optional eigenvector files ->
  ipratios.dat -> optional residual / orthogonality checks -> log.json

Every phase is timed into the accumulating event log with the reference's
hierarchical names (``main:read_command_argument`` ... ``main``), so
``log.json`` is comparable entry-for-entry with an EigenKernel run
(main.f90:54-190).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np


def _print_select_report(values: "np.ndarray", rel_tol: float = 1e-8) -> None:
    """Eigenvalue-cluster diagnostics for selecting solvers — the
    pdsyevx_report analog (solver_scalapack_select.f90:104-135), which
    warned about clustered eigenvalues endangering eigenvector
    orthogonality.  Here clusters are handled by shift separation +
    CholeskyQR2, so this is informational."""
    if values.size < 2:
        return
    span = max(float(values[-1] - values[0]), 1e-300)
    gaps = np.diff(values)
    in_cluster = gaps < rel_tol * span
    n_clusters = 0
    largest = 1
    run = 1
    for flag in in_cluster:
        if flag:
            run += 1
        else:
            if run > 1:
                n_clusters += 1
                largest = max(largest, run)
            run = 1
    if run > 1:
        n_clusters += 1
        largest = max(largest, run)
    if n_clusters:
        print(f"selecting solver: {n_clusters} eigenvalue cluster(s) "
              f"(largest size {largest}, rel gap < {rel_tol:g}); "
              f"orthogonality enforced by shift separation + CholeskyQR2")


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    t_start = time.time()

    from eigenkernel_tpu.core import config as cfg
    from eigenkernel_tpu.obs.events import EventLog

    log = EventLog(stream=True, epoch=t_start)

    try:
        arg = cfg.parse_args(argv)
    except cfg.ArgumentError as exc:
        print(f"[Error] {exc}", file=sys.stderr)
        return 1

    # --- jax setup (before any jax import users)
    import jax

    if arg.platform:
        jax.config.update("jax_platforms", arg.platform)
    if arg.dtype in ("float64", "mixed"):
        jax.config.update("jax_enable_x64", True)
    cache_dir = os.environ.get("EK_CACHE_DIR")
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # --- multi-process runtime (mpi_init analog, main.f90:29-38)
    from eigenkernel_tpu.parallel import multihost as mh

    mh.init_distributed(
        coordinator_address=os.environ.get("EK_COORDINATOR"),
        num_processes=int(os.environ.get("EK_NUM_PROCESSES", "0")) or None,
        process_id=(int(os.environ["EK_PROCESS_ID"])
                    if "EK_PROCESS_ID" in os.environ else None))
    master = mh.is_master()

    from eigenkernel_tpu.core.config import (
        finalize_args, print_command_argument, required_memory,
        settings_json, validate_args)
    from eigenkernel_tpu.io import matrix_market as mm
    from eigenkernel_tpu.io import outputs
    from eigenkernel_tpu.parallel import mesh as meshlib
    from eigenkernel_tpu.solvers.api import solve
    from eigenkernel_tpu.solvers.registry import (AUTO_NAMES, get_spec,
                                                  resolve_auto)
    from eigenkernel_tpu.verify import (
        eval_orthogonality, eval_residual_norm, get_ipratios)

    # --- header probe on process 0 + info broadcast (wrap_mminfo +
    # bcast_matrix_info analog, command_argument.f90:427-452)
    t0 = time.time()
    info_a = info_b = None
    err = None
    if master:
        try:
            info_a = mm.read_header(arg.matrix_A_filename)
            if arg.is_generalized_problem:
                info_b = mm.read_header(arg.matrix_B_filename)
        except (OSError, mm.MatrixMarketError) as exc:
            err = exc
    arg.matrix_A_info = mh.bcast_matrix_info(info_a)
    if arg.is_generalized_problem:
        arg.matrix_B_info = mh.bcast_matrix_info(info_b)
    if arg.matrix_A_info is None or \
            (arg.is_generalized_problem and arg.matrix_B_info is None):
        if master:
            print(f"[Error] mminfo failed: {err}", file=sys.stderr)
        return 1
    finalize_args(arg)

    n_dev = len(jax.devices())
    if master:
        print("---------- Eigen Test start ----------")
        print("----- Configurations -----")
        print_command_argument(arg)
        mem = required_memory(arg, n_dev)
        if mem > 0:
            print(f"approximate required memory per device (Mbytes): "
                  f"{mem / 2**20:10.1f}")
        print(f"devices: {n_dev} ({jax.devices()[0].platform}), "
              f"processes: {jax.process_count()}")
    log.add_event("main:read_command_argument", time.time() - t0)

    if arg.solver_type in AUTO_NAMES:
        # '-s auto' — resolve to the measured-best concrete pipeline before
        # validation so the rest of the run (log.json, report) names it.
        dim = arg.matrix_A_info.rows
        try:
            arg.solver_type = resolve_auto(
                arg.solver_type, dim,
                generalized=arg.is_generalized_problem,
                selecting=arg.n_vec != dim, on_mesh=n_dev > 1,
                backend=jax.default_backend())
        except Exception as exc:
            if master:
                print(f"[Error] {exc}", file=sys.stderr)
            return 1
        if master:
            print(f"auto solver resolved: {arg.solver_type}")

    try:
        validate_args(arg)
    except (cfg.ArgumentError, Exception) as exc:
        if isinstance(exc, cfg.ArgumentError) or \
                type(exc).__name__ == "UnknownSolverError":
            print(f"[Error] {exc}", file=sys.stderr)
            return 1
        raise

    spec = get_spec(arg.solver_type)

    # --- read matrices on process 0 (read_matrix_file analog); COO only —
    # densification happens shard-locally after the broadcast
    t0 = time.time()
    # 'mixed' keeps the device copy in f64 (refinement needs full precision)
    dtype = np.float32 if arg.dtype == "float32" else np.float64
    mat_a = mat_b = None
    ok = True
    if master:
        try:
            mat_a = mm.read_matrix(arg.matrix_A_filename,
                                   arg.matrix_A_info, log)
            if arg.is_generalized_problem:
                mat_b = mm.read_matrix(arg.matrix_B_filename,
                                       arg.matrix_B_info, log)
        except (OSError, mm.MatrixMarketError) as exc:
            ok = False
            print(f"[Error] read_matrix_file failed: {exc}",
                  file=sys.stderr)
    if not mh.bcast_ok(ok):
        return 1
    log.add_event("main:read_matrix_files", time.time() - t0)

    # --- mesh setup + COO broadcast + shard-local densify
    # (bcast_sparse_matrix analog, distribute_matrix.f90:481-523: O(nnz)
    # DCN traffic; no process ever holds the full dense matrix — each
    # builds only its own device shards, distribute_matrix.f90:401-422)
    t0 = time.time()
    mesh = None
    if not spec.single_device and n_dev > 1:
        mesh = meshlib.make_mesh(shape=arg.mesh_shape)
    if arg.is_printing_grid_mapping and master:
        meshlib.print_grid_mapping(mesh or meshlib.single_device_mesh())
    mat_a = mh.bcast_coo(mat_a, arg.matrix_A_info.rows,
                         arg.matrix_A_info.entries)
    a_mat = meshlib.distribute_coo(mat_a, mesh, dtype)
    b_mat = None
    if arg.is_generalized_problem:
        mat_b = mh.bcast_coo(mat_b, arg.matrix_B_info.rows,
                             arg.matrix_B_info.entries)
        b_mat = meshlib.distribute_coo(mat_b, mesh, dtype)
    log.add_event("main:bcast_sparse_matrices", time.time() - t0)

    if arg.is_dry_run:
        if master:
            print("\ndry run mode, exit")
            outputs.write_log_json(
                arg.log_filename,
                settings_json(arg, "eigenkernel_app " + " ".join(argv),
                              arg.block_size or cfg.DEFAULT_BLOCK_SIZE), log)
        return 0

    # --- solve (eigen_solver analog)
    if master:
        print("\n----- Solver Call -----")
    t0 = time.time()
    import contextlib

    profile_cm = jax.profiler.trace(arg.profile_dir) if arg.profile_dir \
        else contextlib.nullcontext()
    try:
        with profile_cm:
            pairs = solve(a_mat, b_mat, solver=arg.solver_type,
                          n_vec=arg.n_vec if spec.selecting else None,
                          mesh=mesh, block_size=arg.block_size, log=log,
                          dtype="mixed" if arg.dtype == "mixed" else None,
                          n_logical=arg.matrix_A_info.rows)
            jax.block_until_ready((pairs.values, pairs.vectors))
    except Exception as exc:
        # terminate() analog (processes.f90:122-139): dump accumulated
        # events, then fail with a coherent message.
        log.print_events(file=sys.stderr)
        print(f"[Error] eigen_solver failed: {exc}", file=sys.stderr)
        return 1
    log.add_event("main:eigen_solver", time.time() - t0)

    if spec.selecting and master:
        _print_select_report(np.asarray(jax.device_get(pairs.values)))

    # --- outputs (rank-0 writes, except owner-parallel eigenvector files)
    t0 = time.time()
    if master:
        values_host = np.asarray(jax.device_get(pairs.values))
        outputs.write_eigenvalues(arg.output_filename, values_host)
    if arg.printed_vecs_ranges:
        outputs.print_eigenvectors(pairs, arg.eigenvector_dir,
                                   arg.printed_vecs_ranges,
                                   arg.is_binary_output)
    log.add_event("main:print_eigenpairs", time.time() - t0)

    # logical-n views for the checkers (the distributed arrays carry the
    # mesh-divisibility zero pad; vectors are logical-n)
    n_log = arg.matrix_A_info.rows
    a_chk = a_mat[:n_log, :n_log] if a_mat.shape[0] != n_log else a_mat
    b_chk = None
    if b_mat is not None:
        b_chk = b_mat[:n_log, :n_log] if b_mat.shape[0] != n_log else b_mat

    t0 = time.time()
    ipr = get_ipratios(pairs, b_chk)
    if master:
        outputs.write_ipratios(arg.ipratios_filename, ipr)
    log.add_event("main:compute_and_print_ipratios", time.time() - t0)

    # --- checks (collective computations on every process, rank-0 prints)
    t0 = time.time()
    if arg.n_check_vec != 0:
        if master:
            print("\n----- Checker Call -----")
        a_norm, rn_ave, rn_max = eval_residual_norm(
            a_chk, pairs, arg.n_check_vec, b_chk)
        if master:
            print(f"A norm: {a_norm:15.8E}")
            print(f"residual norm (average): {rn_ave:15.8E}")
            print(f"residual norm (max):     {rn_max:15.8E}")
    log.add_event("main:eval_residual_norm", time.time() - t0)

    t0 = time.time()
    if arg.ortho_check_index_start != 0:
        ortho = eval_orthogonality(pairs, arg.ortho_check_index_start,
                                   arg.ortho_check_index_end, b_chk)
        if master:
            print(f"orthogonality criterion: {ortho:15.8E}")
    log.add_event("main:eval_orthogonality", time.time() - t0)
    log.add_event("main", time.time() - t_start)

    if master:
        outputs.write_log_json(
            arg.log_filename,
            settings_json(arg, "eigenkernel_app " + " ".join(argv),
                          arg.block_size or cfg.DEFAULT_BLOCK_SIZE), log)
        if arg.verbose_level > 0:
            log.print_events()   # terminate()-style dump (processes.f90)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
