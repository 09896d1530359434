"""CLI argument parsing/validation tests (command_argument.f90 parity)."""

import pytest

from eigenkernel_tpu.core import config as cfg
from eigenkernel_tpu.core.types import MatrixInfo


def _args(extra, a="A.mtx", b=None):
    argv = extra + [a] + ([b] if b else [])
    return cfg.parse_args(argv)


def test_parse_basic_standard():
    a = _args(["-s", "scalapack"])
    assert a.solver_type == "scalapack"
    assert not a.is_generalized_problem


def test_parse_generalized_and_flags():
    a = _args(["-s", "general_elpa2", "-n", "5", "-c", "-1", "-o", "ev.dat",
               "-i", "ipr.dat", "-d", "vecs", "-t", "1,5", "-l", "mylog.json",
               "--block-size", "32", "--dry-run", "--binary",
               "--print-grid-mapping"], b="B.mtx")
    assert a.is_generalized_problem
    assert a.n_vec == 5 and a.n_check_vec == -1
    assert a.output_filename == "ev.dat"
    assert a.ipratios_filename == "ipr.dat"
    assert a.eigenvector_dir == "vecs"
    assert (a.ortho_check_index_start, a.ortho_check_index_end) == (1, 5)
    assert a.log_filename == "mylog.json"
    assert a.block_size == 32
    assert a.is_dry_run and a.is_binary_output and a.is_printing_grid_mapping


def test_parse_index_ranges():
    assert cfg.parse_index_ranges("1-30") == [(1, 30)]
    assert cfg.parse_index_ranges("1-3,7,10-12") == [(1, 3), (7, 7), (10, 12)]
    with pytest.raises(cfg.ArgumentError):
        cfg.parse_index_ranges(",")


def test_missing_matrix():
    with pytest.raises(cfg.ArgumentError):
        cfg.parse_args(["-s", "lapack"])


def test_unknown_option():
    with pytest.raises(cfg.ArgumentError):
        cfg.parse_args(["-s", "lapack", "--what", "A.mtx"])


def _valid_args(solver, generalized, n=30, n_vec=None):
    a = cfg.Args(solver_type=solver, matrix_A_filename="A.mtx",
                 is_generalized_problem=generalized,
                 matrix_B_filename="B.mtx" if generalized else "")
    a.matrix_A_info = MatrixInfo(rows=n, cols=n, entries=n)
    a.matrix_B_info = MatrixInfo(rows=n, cols=n, entries=n)
    a.n_vec = n_vec if n_vec is not None else n
    return a


def test_validate_solver_problem_mismatch():
    with pytest.raises(cfg.ArgumentError):
        cfg.validate_args(_valid_args("scalapack", True))
    with pytest.raises(cfg.ArgumentError):
        cfg.validate_args(_valid_args("general_scalapack", False))


def test_validate_partial_on_nonselecting():
    with pytest.raises(cfg.ArgumentError):
        cfg.validate_args(_valid_args("scalapack", False, n_vec=5))
    cfg.validate_args(_valid_args("scalapack_select", False, n_vec=5))


def test_validate_unknown_solver():
    from eigenkernel_tpu.solvers.registry import UnknownSolverError
    with pytest.raises(UnknownSolverError):
        cfg.validate_args(_valid_args("nonsense", False))


def test_validate_dimension_mismatch():
    a = _valid_args("general_scalapack", True)
    a.matrix_B_info = MatrixInfo(rows=31, cols=31, entries=10)
    with pytest.raises(cfg.ArgumentError):
        cfg.validate_args(a)


def test_validate_check_ranges():
    a = _valid_args("scalapack", False)
    a.n_check_vec = 31
    with pytest.raises(cfg.ArgumentError):
        cfg.validate_args(a)
    a = _valid_args("scalapack", False)
    a.ortho_check_index_start, a.ortho_check_index_end = 5, 2
    with pytest.raises(cfg.ArgumentError):
        cfg.validate_args(a)


def test_required_memory():
    a = _valid_args("lapack", False, n=100)
    a.matrix_A_info.entries = 500
    assert cfg.required_memory(a) == 8 * (500 + 100 * 100)
    b = _valid_args("general_elpa2", True)
    assert cfg.required_memory(b) == -1.0


def test_settings_json_keys():
    a = _valid_args("scalapack", False)
    s = cfg.settings_json(a, "cmd", 64)
    assert set(s) == {"version", "command", "matrix_A_filename",
                      "matrix_B_filename", "log_filename", "dimension",
                      "solver", "g_block_size", "block_size"}
