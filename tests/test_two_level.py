"""Two-level RAS (Nicolaides coarse correction) — beyond-reference feature:
must cut outer iteration counts as the subdomain count grows."""

import numpy as np

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
