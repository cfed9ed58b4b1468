"""The five BASELINE.json configs, scaled to CI-friendly sizes where needed.

1. ani3_crop, regular-1D, 2 subdomains, iterative CG, twosided sync
2. ani4_crop, METIS, 4 subdomains, direct Cholesky, centralized tree
3. 2D Poisson, regular-2D, 16 subdomains, one-sided gathered halo, sync RAS
4. FEM-style (advection), METIS, two-stage local solve, decentralized election
5. large Laplacian, block-partitioned async RAS with overlapped halo collectives
   (full-size multi-host variant runs via bench/dryrun; here 64x64)
"""

import os

import numpy as np
import pytest

from schwarz_tpu import (
    CommSettings,
    GlobalConvergence,
    HaloStrategy,
    LocalSolver,
    Partition,
    Settings,
    advection_diffusion_2d,
    generate_rhs,
    laplacian_2d,
    read_mtx,
    solve,
)
from schwarz_tpu.config import ConvergenceSettings

from schwarz_tpu.models import matrix_path

ANI3 = matrix_path("ani3_crop.mtx")
ANI4 = matrix_path("ani4_crop.mtx")
have_mats = os.path.exists(ANI3)


@pytest.mark.skipif(not have_mats, reason="reference matrices absent")
def test_config1_ani3_regular_cg_twosided():
    A = read_mtx(ANI3)
    r = solve(A, generate_rhs(A.n), Settings(overlap=3, tolerance=1e-6),
              num_subdomains=2)
    assert r.converged and r.relative_residual_norm < 1e-4


@pytest.mark.skipif(not have_mats, reason="reference matrices absent")
def test_config2_ani4_metis_cholesky_tree():
    A = read_mtx(ANI4)
    s = Settings(
        partition=Partition.metis, overlap=3, tolerance=1e-6, max_iters=200,
        local_solver=LocalSolver.direct_cholesky,
        convergence=ConvergenceSettings(method=GlobalConvergence.tree),
    )
    r = solve(A, generate_rhs(A.n), s, num_subdomains=4)
    assert r.converged, (r.iters, r.relative_residual_norm)
    assert r.relative_residual_norm < 1e-4


def test_config3_poisson_regular2d_onesided_gathered():
    A = laplacian_2d(32)   # 1024 rows; 16 subdomains in a 4x4 grid
    s = Settings(
        partition=Partition.regular2d, overlap=3, tolerance=1e-6,
        max_iters=400,
        comm=CommSettings(onesided=True, staleness=1,
                          strategy=HaloStrategy.all_gather),
        convergence=ConvergenceSettings(
            method=GlobalConvergence.decentralized),
    )
    r = solve(A, generate_rhs(A.n), s, num_subdomains=16)
    assert r.converged
    assert r.relative_residual_norm < 1e-4


def test_config4_fem_metis_two_stage_decentralized():
    A = advection_diffusion_2d(16)
    s = Settings(
        partition=Partition.metis, overlap=3, tolerance=1e-6, max_iters=400,
        local_solver=LocalSolver.iterative_gmres, non_symmetric_matrix=True,
        restart_iter=30, local_tolerance=1e-2, local_max_iters=40,  # two-stage
        convergence=ConvergenceSettings(
            method=GlobalConvergence.decentralized),
        comm=CommSettings(onesided=True),
    )
    r = solve(A, generate_rhs(A.n), s, num_subdomains=4)
    assert r.converged
    assert r.relative_residual_norm < 1e-4


def test_config5_async_overlapped_block_partition():
    A = laplacian_2d(64)   # 4096 rows
    s = Settings(
        overlap=4, tolerance=1e-6, max_iters=600,
        comm=CommSettings(onesided=True, overlap_comm=True,
                          strategy=HaloStrategy.neighbor),
    )
    r = solve(A, generate_rhs(A.n), s, num_subdomains=8)
    assert r.converged
    assert r.relative_residual_norm < 1e-4


def test_baseline_precision_target_1e8():
    # the BASELINE convergence target: 1e-8 in double precision (the
    # reference's compute dtype), two-level, 16 subdomains
    from schwarz_tpu.config import Precond

    A = laplacian_2d(64)
    s = Settings(
        partition=Partition.regular2d, overlap=4, tolerance=1e-8,
        max_iters=400, dtype="float64", local_tolerance=1e-8,
        precond=Precond.block_jacobi, block_jacobi_block_size=16,
        two_level=True,
    )
    r = solve(A, generate_rhs(A.n), s, num_subdomains=16)
    assert r.converged
    assert r.relative_residual_norm < 1e-7


def test_two_level_rejects_stale_halos():
    A = laplacian_2d(16)
    s = Settings(two_level=True, comm=CommSettings(overlap_comm=True))
    with pytest.raises(ValueError, match="two_level"):
        solve(A, generate_rhs(A.n), s, num_subdomains=4)


@pytest.mark.skipif(not have_mats, reason="reference matrices absent")
def test_baseline_target_ani4_1e8():
    """BASELINE.md target: converge ani4_crop (3081x3081 anisotropic FEM)
    to 1e-8 in double precision."""
    from schwarz_tpu.config import Precond

    A = read_mtx(ANI4)
    s = Settings(
        partition=Partition.metis, overlap=3, tolerance=1e-8, max_iters=600,
        dtype="float64", local_tolerance=1e-10,
        precond=Precond.block_jacobi, block_jacobi_block_size=16,
    )
    r = solve(A, generate_rhs(A.n), s, num_subdomains=4)
    assert r.converged, (r.iters, r.relative_residual_norm)
    assert r.relative_residual_norm < 1e-7
