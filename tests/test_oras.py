"""O-RAS (optimized Schwarz, Robin transmission conditions; Settings.
oras_weight).  The reference lists O-RAS as an unimplemented checkbox in its
feature table; this implements the standard algebraic ORAS form: the local
solve operator's boundary rows get diag += c * sum|dropped couplings| and the
rhs carries c*D*(neighbor trace), c in (-1, 0] between Dirichlet (0) and
Neumann (-1).  The solve/check operator split keeps convergence detection on
the true A, so the fixed point is exact."""

import numpy as np
import pytest

from schwarz_tpu import Settings, generate_rhs, laplacian_2d, solve
from schwarz_tpu.config import LocalCriterion, LocalSolver, Precond
from schwarz_tpu.models import advection_diffusion_2d


def _true_res(A, b, r):
    x = np.asarray(r.solution)
    return (np.linalg.norm(A.to_scipy() @ x - np.asarray(b))
            / np.linalg.norm(np.asarray(b)))


@pytest.mark.parametrize("gen,solver", [
    (laplacian_2d, LocalSolver.iterative_cg),
    (advection_diffusion_2d, LocalSolver.iterative_gmres),
])
@pytest.mark.slow
def test_oras_cuts_iterations(gen, solver):
    A = gen(32)
    b = generate_rhs(A.n)
    base = Settings(overlap=2, tolerance=1e-8, max_iters=400,
                    local_solver=solver)
    r0 = solve(A, b, base, num_subdomains=8)
    r1 = solve(A, b, base.replace(oras_weight=-0.85), num_subdomains=8)
    assert r0.converged and r1.converged
    # measured: 175 -> 40 (laplace), 84 -> 29 (advection)
    assert r1.iters < 0.5 * r0.iters, (r0.iters, r1.iters)
    assert _true_res(A, b, r1) < 1e-6


def test_oras_fixed_point_exact():
    """The Robin modification must not shift the solution."""
    A = laplacian_2d(24)
    b = generate_rhs(A.n)
    r = solve(A, b, Settings(overlap=3, tolerance=1e-10, max_iters=500,
                             oras_weight=-0.7), num_subdomains=4)
    assert r.converged
    assert _true_res(A, b, r) < 1e-8


@pytest.mark.parametrize("variant", [
    "cholesky", "two_level", "residual_crit", "fgmres", "mixed_precision",
])
def test_oras_combinations(variant):
    A = laplacian_2d(24)
    b = generate_rhs(A.n)
    s = Settings(overlap=2, tolerance=1e-8, max_iters=400, oras_weight=-0.8)
    if variant == "cholesky":
        s = s.replace(local_solver=LocalSolver.direct_cholesky)
    elif variant == "two_level":
        s = s.replace(two_level=True)
    elif variant == "residual_crit":
        import dataclasses
        s = s.replace(convergence=dataclasses.replace(
            s.convergence, criterion=LocalCriterion.residual_based))
    elif variant == "fgmres":
        s = s.replace(accelerator="fgmres")
    elif variant == "mixed_precision":
        s = s.replace(local_compute_dtype="float32")
    r = solve(A, b, s, num_subdomains=4)
    assert r.converged, variant
    assert _true_res(A, b, r) < 1e-6, variant


def test_oras_with_fused_cg_kernel():
    A = laplacian_2d(24)
    b = generate_rhs(A.n)
    s = Settings(overlap=2, tolerance=2e-5, max_iters=300, dtype="float32",
                 local_solver=LocalSolver.iterative_cg, local_tolerance=1e-7,
                 row_pad_multiple=128, spmv_format="dia", oras_weight=-0.8)
    r_ref = solve(A, b, s, num_subdomains=4)
    r_fused = solve(A, b, s.replace(fused_local_cg=True), num_subdomains=4)
    assert r_ref.converged and r_fused.converged
    assert abs(r_fused.iters - r_ref.iters) <= 1
    np.testing.assert_allclose(
        r_fused.solution, r_ref.solution, rtol=0, atol=5e-4
    )


def test_oras_auto():
    """oras_weight='auto' resolves to a coefficient that beats classical."""
    A = laplacian_2d(32)
    b = generate_rhs(A.n)
    base = Settings(overlap=2, tolerance=1e-8, max_iters=400)
    r0 = solve(A, b, base, num_subdomains=8)
    r1 = solve(A, b, base.replace(oras_weight="auto"), num_subdomains=8)
    assert r1.converged
    assert r1.iters < 0.5 * r0.iters
    assert _true_res(A, b, r1) < 1e-6
    with pytest.raises(ValueError, match="float or 'auto'"):
        solve(A, b, base.replace(oras_weight="fast"), num_subdomains=8)


def test_oras_auto_is_coarse_space_aware():
    """'auto' resolves to the milder -0.6 under two_level (-0.8 regresses
    at the f32 floor there; see config.py and the measured sweep in
    scripts/probe_oras_twolevel.py), and stays -0.8 one-level."""
    from schwarz_tpu.core.decompose import decompose
    from schwarz_tpu.ras import RASolver

    A = laplacian_2d(24)
    b = generate_rhs(A.n)
    for two_level, expect in ((False, -0.8), (True, -0.6)):
        s = Settings(overlap=2, tolerance=1e-6, max_iters=200,
                     oras_weight="auto", two_level=two_level)
        solver = RASolver(decompose(A, b, s, 4))
        assert solver._oras_c == expect, (two_level, solver._oras_c)
    # and the two-level auto config still converges to the true solution
    r = solve(A, b, Settings(overlap=2, tolerance=1e-6, max_iters=200,
                             oras_weight="auto", two_level=True),
              num_subdomains=4)
    assert r.converged
    assert _true_res(A, b, r) < 1e-4


def test_oras_zero_is_classical():
    """oras_weight=0 must be bit-identical to the classical path."""
    A = laplacian_2d(20)
    b = generate_rhs(A.n)
    base = Settings(overlap=2, tolerance=1e-8, max_iters=300)
    r0 = solve(A, b, base, num_subdomains=4)
    r1 = solve(A, b, base.replace(oras_weight=0.0), num_subdomains=4)
    assert r0.iters == r1.iters
    np.testing.assert_array_equal(r0.solution, r1.solution)
    np.testing.assert_array_equal(
        r0.global_resnorm_history, r1.global_resnorm_history
    )


def test_oras_jacobi_precond_uses_solve_operator():
    """The preconditioner must be extracted from the Robin-modified operator
    (otherwise inner CG stalls on the mismatched diagonal)."""
    A = laplacian_2d(24)
    b = generate_rhs(A.n)
    s = Settings(overlap=2, tolerance=1e-8, max_iters=400, oras_weight=-0.8,
                 precond=Precond.jacobi)
    r = solve(A, b, s, num_subdomains=4)
    assert r.converged
    assert _true_res(A, b, r) < 1e-6


def test_oras_3d_laplacian():
    """7-point 3-D stencil: auto coefficient still cuts iterations."""
    from schwarz_tpu.models import laplacian_3d

    A = laplacian_3d(12)
    b = generate_rhs(A.n)
    base = Settings(overlap=2, tolerance=1e-8, max_iters=400)
    r0 = solve(A, b, base, num_subdomains=4)
    r1 = solve(A, b, base.replace(oras_weight="auto"), num_subdomains=4)
    assert r0.converged and r1.converged
    assert r1.iters < r0.iters          # measured: 27 -> 16
    assert _true_res(A, b, r1) < 1e-6
