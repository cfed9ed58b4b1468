"""Two-level RAS (Nicolaides coarse correction) — beyond-reference feature:
must cut outer iteration counts as the subdomain count grows."""

import numpy as np
import pytest

from schwarz_tpu import Settings, generate_rhs, laplacian_2d, solve


def test_two_level_converges_and_accelerates():
    A = laplacian_2d(24)
    b = generate_rhs(A.n)
    base = Settings(overlap=3, tolerance=1e-8, max_iters=400)
    r1 = solve(A, b, base, num_subdomains=8)
    r2 = solve(A, b, base.replace(two_level=True), num_subdomains=8)
    assert r1.converged and r2.converged
    assert r2.relative_residual_norm < 1e-6
    # the coarse space kills the low-frequency error: strictly fewer iterations
    assert r2.iters < r1.iters


def test_two_level_solution_correct():
    import scipy.sparse.linalg as spla

    A = laplacian_2d(16)
    b = generate_rhs(A.n)
    r = solve(A, b, Settings(overlap=3, tolerance=1e-10, max_iters=400,
                             two_level=True), num_subdomains=4)
    assert r.converged
    x_direct = spla.spsolve(A.to_scipy().tocsc(), b)
    np.testing.assert_allclose(r.solution, x_direct, rtol=1e-6, atol=1e-8)


def test_coarse_aggregates_accelerate_stationary():
    # q sub-aggregates per subdomain: richer coarse space, fewer (or equal)
    # outer iterations, same fixed point (measured 120 -> 95 at 128^2/16)
    import scipy.sparse.linalg as spla

    from schwarz_tpu.config import Partition, Precond

    A = laplacian_2d(64)
    b = generate_rhs(A.n)
    base = Settings(overlap=4, tolerance=1e-7, max_iters=600,
                    two_level=True, partition=Partition.regular2d,
                    precond=Precond.block_jacobi, local_max_iters=20,
                    row_pad_multiple=128)
    r1 = solve(A, b, base, num_subdomains=4)
    rq = solve(A, b, base.replace(coarse_aggregates=8), num_subdomains=4)
    assert r1.converged and rq.converged
    assert rq.iters <= r1.iters
    x_direct = spla.spsolve(A.to_scipy().tocsc(), b)
    err = np.linalg.norm(rq.solution - x_direct) / np.linalg.norm(x_direct)
    assert err < 1e-5


def test_spectral_coarse_space_beats_aggregates():
    # GenEO-style Neumann-block eigenvector coarse space: at equal coarse
    # size it must need (substantially) fewer outer iterations than the
    # contiguous-aggregate space, and reach the same fixed point.
    # Measured at 128^2/16, q=16: aggregates 117 -> spectral 15 iters.
    import scipy.sparse.linalg as spla

    from schwarz_tpu.config import Partition, Precond

    A = laplacian_2d(64)
    b = generate_rhs(A.n)
    base = Settings(overlap=4, tolerance=1e-7, max_iters=600,
                    two_level=True, partition=Partition.regular2d,
                    precond=Precond.block_jacobi, local_max_iters=20,
                    row_pad_multiple=128, coarse_aggregates=8)
    ra = solve(A, b, base, num_subdomains=4)
    rs = solve(A, b, base.replace(coarse_space="spectral"), num_subdomains=4)
    assert ra.converged and rs.converged
    assert rs.iters < ra.iters
    x_direct = spla.spsolve(A.to_scipy().tocsc(), b)
    err = np.linalg.norm(rs.solution - x_direct) / np.linalg.norm(x_direct)
    assert err < 1e-5


def test_spectral_coarse_space_anisotropic_metis():
    # the algebraic construction must work on unstructured (metis)
    # partitions of non-grid-aligned anisotropic operators — where
    # geometric index aggregates have no meaning
    from schwarz_tpu.config import Partition
    from schwarz_tpu.models.fem import anisotropic_diffusion_2d

    A = anisotropic_diffusion_2d(48, eps=100.0, theta=0.5)
    b = generate_rhs(A.n)
    base = Settings(overlap=3, tolerance=1e-7, max_iters=800,
                    two_level=True, partition=Partition.metis,
                    coarse_aggregates=8)
    ra = solve(A, b, base, num_subdomains=4)
    rs = solve(A, b, base.replace(coarse_space="spectral"), num_subdomains=4)
    assert ra.converged and rs.converged
    assert rs.iters < ra.iters


@pytest.mark.slow
def test_spectral_coarse_space_nonsymmetric():
    # symmetrized-Neumann eigenbasis + true-A Galerkin coarse matrix: the
    # spectral space must accelerate the nonsymmetric (GMRES-local) path
    # too (measured 51 -> 11 outer iterations at 64^2/4, q=8)
    from schwarz_tpu.config import LocalSolver
    from schwarz_tpu.models.fem import advection_diffusion_2d

    A = advection_diffusion_2d(48)
    b = generate_rhs(A.n)
    base = Settings(overlap=3, tolerance=1e-7, max_iters=600,
                    non_symmetric_matrix=True,
                    local_solver=LocalSolver.iterative_gmres)
    r1 = solve(A, b, base, num_subdomains=4)
    rs = solve(A, b, base.replace(two_level=True, coarse_space="spectral",
                                  coarse_aggregates=8), num_subdomains=4)
    assert r1.converged and rs.converged
    assert rs.iters < r1.iters


def test_coarse_space_invalid_value_raises():
    import pytest

    A = laplacian_2d(16)
    b = generate_rhs(A.n)
    with pytest.raises(ValueError, match="coarse_space"):
        solve(A, b, Settings(two_level=True, coarse_space="nope"),
              num_subdomains=4)


def test_coarse_aggregates_must_divide_interior():
    import pytest

    A = laplacian_2d(16)
    b = generate_rhs(A.n)
    with pytest.raises(ValueError, match="coarse_aggregates"):
        solve(A, b, Settings(two_level=True, coarse_aggregates=7,
                             row_pad_multiple=128),
              num_subdomains=4)


def test_spectral_coarse_instrumented_matches_fused():
    # the staged instrumented loop's coarse stage must reproduce the fused
    # loop bit-for-bit with the spectral basis too
    from schwarz_tpu.core.decompose import decompose
    from schwarz_tpu.ras import RASolver

    A = laplacian_2d(24)
    b = generate_rhs(A.n)
    s = Settings(overlap=3, tolerance=1e-8, max_iters=200, two_level=True,
                 coarse_space="spectral", coarse_aggregates=4,
                 row_pad_multiple=64)
    r_fused = RASolver(decompose(A, b, s, 4)).run()
    r_inst = RASolver(decompose(A, b, s, 4)).run_instrumented()
    assert r_fused.iters == r_inst.iters
    np.testing.assert_array_equal(r_fused.solution, r_inst.solution)


def test_coarse_aggregates_instrumented_matches_fused():
    # the staged instrumented loop's coarse stage must reproduce the fused
    # loop bit-for-bit with q > 1 as well
    from schwarz_tpu.core.decompose import decompose
    from schwarz_tpu.ras import RASolver

    A = laplacian_2d(24)
    b = generate_rhs(A.n)
    s = Settings(overlap=3, tolerance=1e-8, max_iters=200, two_level=True,
                 coarse_aggregates=4, row_pad_multiple=64)
    dec = decompose(A, b, s, 4)
    r_fused = RASolver(dec).run()
    r_inst = RASolver(decompose(A, b, s, 4)).run_instrumented()
    assert r_fused.iters == r_inst.iters
    np.testing.assert_array_equal(r_fused.solution, r_inst.solution)


@pytest.mark.slow
def test_coarse_solver_cg_matches_dense():
    # distributed-CG coarse solve (coarse_solver="cg": row-sharded Galerkin
    # matrix, all_gather matvec, psum dots — nothing (qS)^2 replicated)
    # must converge like the dense replicated inverse, for both coarse
    # spaces.  Measured identical outer counts at 64^2/16 (58/58 and 13/13).
    A = laplacian_2d(32)
    b = generate_rhs(A.n)
    for space in ("aggregates", "spectral"):
        base = Settings(overlap=3, tolerance=1e-8, max_iters=400,
                        two_level=True, coarse_aggregates=2,
                        coarse_space=space)
        rd = solve(A, b, base, num_subdomains=8)
        rc = solve(A, b, base.replace(coarse_solver="cg"), num_subdomains=8)
        assert rd.converged and rc.converged, space
        assert abs(rc.iters - rd.iters) <= 2, (space, rd.iters, rc.iters)
        np.testing.assert_allclose(rc.solution, rd.solution,
                                   rtol=1e-5, atol=1e-7)


def test_coarse_solver_invalid_raises():
    import pytest

    A = laplacian_2d(16)
    b = generate_rhs(A.n)
    with pytest.raises(ValueError, match="coarse_solver"):
        solve(A, b, Settings(two_level=True, coarse_solver="lu"),
              num_subdomains=4)


@pytest.mark.slow
def test_coarse_solver_cg_scale_invariant():
    # regression: the coarse CG's eps-floored coefficient guards clamped
    # scale-dependent quantities (b*1e-9 cost 57 -> 93 outers before the
    # unit-norm normalization); cg must match dense at any rhs scale
    A = laplacian_2d(32)
    b = generate_rhs(A.n)

    def iters(cs, scale):
        s = Settings(overlap=3, tolerance=1e-4, max_iters=400,
                     dtype="float32", two_level=True, coarse_aggregates=2,
                     coarse_space="spectral", coarse_solver=cs)
        r = solve(A, b * scale, s, num_subdomains=8)
        assert r.converged, (cs, scale)
        return r.iters

    for scale in (1.0, 1e-9):
        assert abs(iters("cg", scale) - iters("dense", scale)) <= 2


def test_coarse_solver_cg_rejects_nonsymmetric():
    import pytest

    from schwarz_tpu.config import LocalSolver
    from schwarz_tpu.models.fem import advection_diffusion_2d

    A = advection_diffusion_2d(12)
    b = generate_rhs(A.n)
    with pytest.raises(ValueError, match="symmetric"):
        solve(A, b, Settings(two_level=True, coarse_solver="cg",
                             non_symmetric_matrix=True,
                             local_solver=LocalSolver.iterative_gmres),
              num_subdomains=4)
