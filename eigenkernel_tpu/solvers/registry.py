"""The solver registry: ``-s <name>`` -> pipeline combination.

Reference parity: solver_main.f90:52-99 (the select-case dispatch) plus the
solver list in README.md:64-83.  Names are preserved verbatim so CLI
invocations and ``log.json`` files are comparable run-for-run.  "ELPA" /
"EigenExa" in a name no longer means an external library — it names the
*pipeline shape* those backends stood for (see solvers/pipelines.py):

  name                          reduction    SEP core    paper tag
  ----------------------------- ----------- ----------- ---------
  lapack                         —           eigh (1dev)
  scalapack                      —           one_stage
  scalapack_select               —           one_stage (partial)
  eigensx                        —           two_stage
  general_scalapack              scalapack   one_stage    'A'
  general_scalapack_select       scalapack   one_stage (partial)
  general_scalapacknew_eigens    scalapack   one_stage
  general_scalapack_eigensx      scalapack   two_stage    'B'
  general_scalapack_eigens       scalapack   one_stage
  general_elpa_scalapack         elpa        one_stage    'C'
  general_elpa1                  elpa        one_stage    'E'
  general_elpa2                  elpa        two_stage    'D'
  general_elpa_eigensx           elpa        two_stage    'G'
  general_elpa_eigens            elpa        one_stage    'F'
  eigh / general_eigh            (elpa)      eigh        TPU-native extras

Unlike the reference there are no dummy backends that abort at runtime
(solver_elpa_dummy.f90:21): every pipeline is always available because all
kernels are in-tree.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional


@dataclass(frozen=True)
class SolverSpec:
    name: str
    generalized: bool
    selecting: bool
    family: str              # lapack | scalapack | eigenexa | elpa | extra
    core: str                # eigh | one_stage | two_stage
    reduction: Optional[str]  # None | 'scalapack' | 'elpa'
    single_device: bool = False
    description: str = ""


def _s(name, generalized, selecting, family, core, reduction,
       single_device=False, description=""):
    return SolverSpec(name, generalized, selecting, family, core, reduction,
                      single_device, description)


SOLVERS: dict[str, SolverSpec] = {s.name: s for s in [
    _s("lapack", False, False, "lapack", "eigh", None, True,
       "replicated single-device solve (dsyev analog)"),
    _s("scalapack", False, False, "scalapack", "one_stage", None,
       description="tridiag + tridiagonal solve + back-transform "
                   "(pdsytrd/pdstedc/pdormtr analog)"),
    _s("scalapack_select", False, True, "scalapack", "one_stage", None,
       description="partial spectrum via bisection/inverse iteration "
                   "(pdsyevx analog)"),
    _s("general_scalapack", True, False, "scalapack", "one_stage",
       "scalapack", description="solver 'A': pdpotrf+pdsygst reduction"),
    _s("general_scalapack_select", True, True, "scalapack", "one_stage",
       "scalapack"),
    _s("general_scalapacknew_eigens", True, False, "scalapack", "one_stage",
       "scalapack_new",
       description="pdsyngst-variant (half-matrix) reduction + eigen_s "
                   "core (generalized_to_standard.f90:48-89)"),
    _s("eigensx", False, False, "eigenexa", "two_stage", None,
       description="two-stage (full->band->tridiag) reduction, eigen_sx "
                   "analog"),
    _s("general_scalapack_eigensx", True, False, "eigenexa", "two_stage",
       "scalapack", description="solver 'B'"),
    _s("general_scalapack_eigens", True, False, "eigenexa", "one_stage",
       "scalapack"),
    _s("general_elpa_scalapack", True, False, "elpa", "one_stage", "elpa",
       description="solver 'C': ELPA-style reduction, pdsyevd-analog core"),
    _s("general_elpa1", True, False, "elpa", "one_stage", "elpa",
       description="solver 'E'"),
    _s("general_elpa2", True, False, "elpa", "two_stage", "elpa",
       description="solver 'D'"),
    _s("general_elpa_eigensx", True, False, "elpa", "two_stage", "elpa",
       description="solver 'G' (flagship hybrid)"),
    _s("general_elpa_eigens", True, False, "elpa", "one_stage", "elpa",
       description="solver 'F'"),
    # TPU-native extras
    _s("eigh", False, False, "extra", "eigh", None,
       description="XLA QDWH eigensolver (TPU-native extra)"),
    _s("general_eigh", True, False, "extra", "eigh", "elpa",
       description="ELPA-style reduction + XLA QDWH (TPU-native extra)"),
    _s("jacobi", False, False, "extra", "jacobi", None,
       description="block-Jacobi: batched pair eigh + GEMM rotations, no "
                   "sequential panels (TPU-native extra)"),
    _s("general_jacobi", True, False, "extra", "jacobi", "elpa",
       description="ELPA-style reduction + block-Jacobi core "
                   "(TPU-native extra)"),
    _s("qdwh_dc", False, False, "extra", "qdwh", None,
       description="in-tree QDWH polar spectral divide-and-conquer: "
                   "sign-function projector splitting, all-GEMM critical "
                   "path (TPU-native extra)"),
    _s("general_qdwh_dc", True, False, "extra", "qdwh", "elpa",
       description="ELPA-style reduction + QDWH spectral D&C core "
                   "(TPU-native extra)"),
]}


AUTO_NAMES = ("auto", "general_auto")


def resolve_auto(name: str, n: int, generalized: bool, selecting: bool,
                 on_mesh: bool, backend: str) -> str:
    """Resolve ``-s auto`` to a concrete registry name.

    The reference's whole point is comparing solver combinations to "find
    the best one" (README.md:4-5) — ``auto`` encodes the winners of the
    committed TPU measurements (evidence/SWEEP_r4.md; the per-decision
    probes are cited inline below).  Heuristics:

    * selecting: the pdsyevx-analog path (which itself picks the two-stage
      core on TPU at n >= 2048, solvers/api.py);
    * single-chip TPU, small n: XLA's fused QDWH ``eigh`` wins while the
      staged pipeline is latency-bound (measured 0.06 s vs 0.47+ s at
      n = 1024); crossover knob EK_AUTO_EIGH_MAX (default 1024);
    * single-chip TPU, large n: the two-stage pipeline (Pallas VMEM
      chase + wf_bt v3 Pallas back-transform) — measured 9.67 s vs
      one-stage's 12.24 s at n = 16384 full spectrum (RESULTS_r4.md
      r4e stages16k_wfp); still loses at 8192 (2.02 vs 1.68 s), so the
      crossover knob EK_AUTO_TWOSTAGE_MIN defaults to 12288;
    * everything else: the one-stage pipeline (tridiagonalization runs at
      78-90 % of the HBM roofline; measured 0.53 s vs eigh's 0.65 s at
      n = 4096, evidence/SWEEP_r4.md sweep_std4096c), with the pdsyngst-
      style half-matrix reduction for generalized problems — the measured
      winner of the 12-name generalized sweep (0.674 s at n = 4096; all
      one-stage reductions within 3 %, sweep_gen4096c).
    """
    import os

    if name not in AUTO_NAMES:
        return name
    if generalized != name.startswith("general"):
        kind = "generalized" if generalized else "standard"
        raise UnknownSolverError(f"solver '{name}' is not for {kind} "
                                 f"problems (use "
                                 f"'{AUTO_NAMES[int(generalized)]}')")
    if selecting:
        return ("general_scalapack_select" if generalized
                else "scalapack_select")
    eigh_max = int(os.environ.get("EK_AUTO_EIGH_MAX", "1024"))
    if backend == "tpu" and not on_mesh and n <= eigh_max:
        return "general_eigh" if generalized else "eigh"
    twostage_min = int(os.environ.get("EK_AUTO_TWOSTAGE_MIN", "12288"))
    if backend == "tpu" and not on_mesh and n >= twostage_min:
        return "general_elpa_eigensx" if generalized else "eigensx"
    return "general_scalapacknew_eigens" if generalized else "scalapack"


class UnknownSolverError(ValueError):
    pass


def get_spec(name: str) -> SolverSpec:
    try:
        return SOLVERS[name]
    except KeyError:
        raise UnknownSolverError(
            f"eigen_solver: Unknown solver '{name}'") from None


def solver_names() -> list[str]:
    return list(SOLVERS)
