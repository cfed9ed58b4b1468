"""Mixed-precision modes: f32 halo buffers (reference use_mixed_precision) and
f32 local solves under f64 residuals (iterative refinement — the SURVEY §7
"f32-compute/f64-accumulate" validation target)."""

import numpy as np
import pytest

from schwarz_tpu import (
    LocalSolver,
    Partition,
    Settings,
    generate_rhs,
    laplacian_2d,
    solve,
)
from schwarz_tpu.config import Precond


BASE = dict(
    partition=Partition.regular2d, overlap=4, tolerance=1e-8, max_iters=500,
    precond=Precond.block_jacobi, block_jacobi_block_size=16, two_level=True,
)


def test_f32_inner_reaches_f64_tolerance():
    A = laplacian_2d(48)
    b = generate_rhs(A.n)
    r64 = solve(A, b, Settings(**BASE, dtype="float64"), num_subdomains=16)
    rmix = solve(
        A, b,
        Settings(**BASE, dtype="float64", local_compute_dtype="float32",
                 local_tolerance=1e-5),
        num_subdomains=16,
    )
    assert r64.converged and rmix.converged
    assert rmix.relative_residual_norm < 1e-7
    # refinement recovers full accuracy with (near-)identical outer counts
    assert abs(rmix.iters - r64.iters) <= 5
    np.testing.assert_allclose(rmix.solution, r64.solution, atol=1e-7)


def test_f32_inner_direct_cholesky_refinement():
    # low-precision factorization + high-precision residual = classic IR
    A = laplacian_2d(16)
    b = generate_rhs(A.n)
    s = Settings(
        overlap=3, tolerance=1e-9, max_iters=300, dtype="float64",
        local_compute_dtype="float32",
        local_solver=LocalSolver.direct_cholesky,
    )
    r = solve(A, b, s, num_subdomains=4)
    assert r.converged
    assert r.relative_residual_norm < 1e-8


def test_halo_dtype_floor_documented_behavior():
    # f32 halos under f64 compute: converges at tolerances above the halo floor
    A = laplacian_2d(16)
    b = generate_rhs(A.n)
    s = Settings(overlap=3, tolerance=1e-5, max_iters=400, dtype="float64",
                 halo_dtype="float32")
    r = solve(A, b, s, num_subdomains=4)
    assert r.converged
    assert r.relative_residual_norm < 1e-4
