"""Umbrella exports, multihost helpers, event logger semantics."""

import numpy as np


def test_umbrella_exports():
    import eigenkernel_tpu as ek

    assert callable(ek.solve)
    assert "general_elpa2" in ek.SOLVERS
    assert ek.get_spec("scalapack").core == "one_stage"
    assert callable(ek.read_matrix)
    assert ek.layout_grid(8) == (2, 4)


def test_multihost_single_process():
    from eigenkernel_tpu.parallel import multihost as mh

    mh.init_distributed()            # no-op single process
    assert mh.is_master()
    from eigenkernel_tpu.core.types import SparseMatrix

    sp = SparseMatrix(size=3, rows=np.array([0, 1, 2]),
                      cols=np.array([0, 1, 2]),
                      values=np.array([1.0, 2.0, 3.0]))
    out = mh.bcast_coo(sp, 3, 3)
    assert np.array_equal(out.values, sp.values)


def test_event_log_accumulation(capsys):
    from eigenkernel_tpu.obs.events import EventLog

    log = EventLog(stream=False)
    log.add_event("a:b", 1.0)
    log.add_event("a:b", 2.5)
    log.add_event("c", 0.5)
    evs = log.events()
    assert evs[0] == {"name": "a:b", "num_repeated": 2, "val": 3.5}
    assert evs[1]["name"] == "c"
    assert log.get("a:b") == 3.5


def test_event_log_stream(capsys):
    import sys
    from eigenkernel_tpu.obs.events import EventLog

    log = EventLog(stream=True)
    log.add_event("phase", 0.25)
    err = capsys.readouterr().err
    assert "[Event" in err and "phase,0.25" in err


def test_select_report(capsys):
    from eigenkernel_tpu.cli import _print_select_report

    vals = np.array([1.0, 1.0 + 1e-12, 2.0, 3.0])
    _print_select_report(vals)
    out = capsys.readouterr().out
    assert "cluster" in out
