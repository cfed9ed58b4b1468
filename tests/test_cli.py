"""CLI flag -> Settings mapping tests (C30: bench_base.hpp:50-144 flags mapped
onto Settings the way bench_ras.cpp:50-150 does)."""

import json
import subprocess
import sys

import pytest

from schwarz_tpu.cli import build_parser, settings_from_args
from schwarz_tpu.config import (
    GlobalConvergence,
    HaloStrategy,
    LocalCriterion,
    LocalSolver,
    Partition,
    Precond,
)


def _settings(argv):
    return settings_from_args(build_parser().parse_args(argv))


def test_default_mapping():
    s = _settings([])
    assert s.partition == Partition.regular
    assert s.local_solver == LocalSolver.iterative_cg
    assert s.overlap == 2
    assert s.tolerance == 1e-6
    assert s.convergence.method == GlobalConvergence.allgather


def test_solver_aliases():
    assert _settings(["--local_solver", "iterative-ginkgo"]).local_solver \
        == LocalSolver.iterative_cg
    assert _settings(["--local_solver", "direct-cholmod"]).local_solver \
        == LocalSolver.direct_cholesky
    assert _settings(["--local_solver", "direct-umfpack"]).local_solver \
        == LocalSolver.direct_lu
    # non_symmetric steers iterative to GMRES (solve.cpp:746-752)
    s = _settings(["--local_solver", "cg", "--non_symmetric_matrix"])
    assert s.local_solver == LocalSolver.iterative_gmres


def test_onesided_convergence_mapping():
    s = _settings(["--enable_onesided",
                   "--global_convergence_type", "decentralized",
                   "--enable_comm_overlap_staleness", "3"])
    assert s.comm.onesided
    assert s.comm.staleness == 3
    assert s.convergence.method == GlobalConvergence.decentralized
    s2 = _settings(["--enable_onesided"])
    assert s2.convergence.method == GlobalConvergence.tree  # centralized-tree


def test_precision_flags():
    s = _settings(["--use_mixed_precision", "--dtype", "float64",
                   "--local_compute_dtype", "float32"])
    assert s.halo_dtype == "float32"
    assert s.local_compute_dtype == "float32"
    assert s.dtype == "float64"


def test_precond_flags():
    s = _settings(["--use_precond", "--precond", "jacobi"])
    assert s.precond == Precond.jacobi
    s = _settings(["--use_precond", "--precond_max_block_size", "8"])
    assert s.precond == Precond.block_jacobi
    assert s.block_jacobi_block_size == 8
    assert _settings([]).precond == Precond.none


def test_comm_strategy_and_criterion():
    s = _settings(["--comm_strategy", "neighbor",
                   "--local_convergence_crit", "residual-based",
                   "--enable_overlap"])
    assert s.comm.strategy == HaloStrategy.neighbor
    assert s.convergence.criterion == LocalCriterion.residual_based
    assert s.comm.overlap_comm


def test_beyond_reference_flags():
    s = _settings(["--two_level", "--accelerator", "fgmres"])
    assert s.two_level
    assert s.accelerator == "fgmres"


def test_disable_global_check_selects_allreduce():
    # regression (ADVICE r1): the flag was store_true with default=True and
    # could never select the two-sided allreduce branch (solve.cpp:949-953)
    from schwarz_tpu.config import GlobalConvergence

    s = _settings(["--no-enable_global_check"])
    assert s.convergence.method == GlobalConvergence.allreduce
    s2 = _settings([])
    assert s2.convergence.method == GlobalConvergence.allgather


def test_reference_alias_flags():
    # the reference's own flag names (bench_base.hpp:61-140) port verbatim
    from schwarz_tpu.config import LocalSolver, Precond

    s = _settings(["--local_precond", "isai"])
    assert s.precond == Precond.fsai
    s = _settings(["--local_precond", "block-jacobi"])
    assert s.precond == Precond.block_jacobi
    s = _settings(["--local_factorization", "umfpack"])
    assert s.local_solver == LocalSolver.direct_lu
    s = _settings(["--local_factorization", "cholmod"])
    assert s.local_solver == LocalSolver.direct_cholesky
    s = _settings(["--no-enable_twosided"])
    assert s.comm.onesided
    s = _settings(["--enable_debug_write"])
    assert s.write_debug_out


def test_reference_alias_parilu_maps_to_ilu():
    # since round 4 parilu maps to the TPU-native ILU(0) (host
    # factorization + Jacobi-sweep triangular applies) instead of raising
    from schwarz_tpu.config import Precond

    s = _settings(["--local_precond", "parilu"])
    assert s.precond == Precond.ilu
    s2 = _settings(["--local_precond", "ilu", "--ilu_sweeps", "5"])
    assert s2.precond == Precond.ilu
    assert s2.ilu_sweeps == 5


def test_reference_flag_surface_complete():
    # EVERY gflag the reference defines (bench_base.hpp DEFINE_*) must be
    # accepted by our parser under its exact name (behavior or a loud
    # raise — never an unknown-argument error)
    import re

    from schwarz_tpu.cli import build_parser

    src = open("/root/reference/benchmarking/bench_base.hpp").read()
    ref_flags = set(re.findall(r"DEFINE_\w+\((\w+)", src))
    p = build_parser()
    known = {a.lstrip("-").replace("-", "_")
             for action in p._actions for a in action.option_strings}
    missing = sorted(f for f in ref_flags if f not in known)
    assert not missing, f"reference flags without a CLI mirror: {missing}"


def test_nonconverged_solve_prints_actionable_hints(capsys):
    # round-4 verdict weak item 8: a stalled one-level solve must surface
    # "try --two_level / --oras_weight" guidance, not a bare failure line
    from schwarz_tpu.cli import main

    main(["--executor", "cpu", "--set_1d_laplacian_size", "20",
          "--num_subdomains", "4", "--num_iters", "3"])
    err = capsys.readouterr().err
    assert "did not converge" in err
    assert "hint: try --two_level" in err
    assert "--oras_weight" in err
