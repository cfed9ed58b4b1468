"""Batched local solver tests against dense numpy oracles (reference C13/C14)."""

import jax.numpy as jnp
import numpy as np
import pytest

from schwarz_tpu.config import Precond, Settings
from schwarz_tpu.core.decompose import decompose
from schwarz_tpu.models import (
    advection_diffusion_2d,
    generate_rhs,
    laplacian_2d,
)
from schwarz_tpu.solvers import (
    cg_solve,
    cholesky_factor,
    cholesky_solve,
    gmres_solve,
    lu_factor,
    lu_solve,
    make_preconditioner,
)


def _batched_problem(mat, S=4, overlap=3):
    b = generate_rhs(mat.n)
    dec = decompose(mat, b, Settings(overlap=overlap), S)
    vals = jnp.asarray(dec.lmat_vals)
    cols = jnp.asarray(dec.lmat_cols)
    rhs = jnp.asarray(dec.local_rhs)
    return dec, vals, cols, rhs


def _dense_oracle(dec, p):
    from schwarz_tpu.ops.spmv import ell_to_dense

    R = dec.meta.max_rows
    return np.asarray(
        ell_to_dense(jnp.asarray(dec.lmat_vals[p]), jnp.asarray(dec.lmat_cols[p]), R)
    )


def test_cg_solves_spd_batch():
    dec, vals, cols, rhs = _batched_problem(laplacian_2d(8))
    res = cg_solve(vals, cols, rhs, jnp.zeros_like(rhs), 1e-12, 500)
    for p in range(4):
        A = _dense_oracle(dec, p)
        expect = np.linalg.solve(A, np.asarray(rhs[p]))
        np.testing.assert_allclose(np.asarray(res.x[p]), expect, atol=1e-8)
    assert (np.asarray(res.rel_resnorm) < 1e-10).all()


def test_cg_warm_start_stays_correct():
    # the reduction criterion is relative to each solve's own initial residual
    # (Ginkgo ResidualNormReduction semantics, solve.cpp:472-477), so a warm
    # start does not short-circuit the reduction — but must stay correct
    dec, vals, cols, rhs = _batched_problem(laplacian_2d(8))
    cold = cg_solve(vals, cols, rhs, jnp.zeros_like(rhs), 1e-10, 500)
    warm = cg_solve(vals, cols, rhs, cold.x, 1e-6, 500)
    for p in range(4):
        A = _dense_oracle(dec, p)
        expect = np.linalg.solve(A, np.asarray(rhs[p]))
        np.testing.assert_allclose(np.asarray(warm.x[p]), expect, atol=1e-8)


def test_cg_with_preconditioners():
    for precond in [Precond.jacobi, Precond.block_jacobi]:
        s = Settings(precond=precond, block_jacobi_block_size=8)
        dec, vals, cols, rhs = _batched_problem(laplacian_2d(8))
        M = make_preconditioner(s, vals, cols)
        res = cg_solve(vals, cols, rhs, jnp.zeros_like(rhs), 1e-12, 500, precond=M)
        for p in range(4):
            A = _dense_oracle(dec, p)
            expect = np.linalg.solve(A, np.asarray(rhs[p]))
            np.testing.assert_allclose(np.asarray(res.x[p]), expect, atol=1e-7)


def test_gmres_solves_nonsymmetric_batch():
    dec, vals, cols, rhs = _batched_problem(advection_diffusion_2d(8))
    res = gmres_solve(vals, cols, rhs, jnp.zeros_like(rhs), 1e-12, 600, restart=40)
    for p in range(4):
        A = _dense_oracle(dec, p)
        expect = np.linalg.solve(A, np.asarray(rhs[p]))
        np.testing.assert_allclose(np.asarray(res.x[p]), expect, atol=1e-6)


def test_cholesky_direct():
    dec, vals, cols, rhs = _batched_problem(laplacian_2d(8))
    L = cholesky_factor(vals, cols)
    x = cholesky_solve(L, rhs)
    for p in range(4):
        A = _dense_oracle(dec, p)
        expect = np.linalg.solve(A, np.asarray(rhs[p]))
        np.testing.assert_allclose(np.asarray(x[p]), expect, atol=1e-10)


def test_lu_direct_nonsymmetric():
    dec, vals, cols, rhs = _batched_problem(advection_diffusion_2d(8))
    f = lu_factor(vals, cols)
    x = lu_solve(f, rhs)
    for p in range(4):
        A = _dense_oracle(dec, p)
        expect = np.linalg.solve(A, np.asarray(rhs[p]))
        np.testing.assert_allclose(np.asarray(x[p]), expect, atol=1e-10)


def test_cg_zero_rhs_stays_zero():
    dec, vals, cols, rhs = _batched_problem(laplacian_2d(8))
    res = cg_solve(vals, cols, jnp.zeros_like(rhs), jnp.zeros_like(rhs), 1e-12, 50)
    assert np.asarray(res.x).max() == 0.0
    assert int(res.iters.max()) == 0


def test_inverse_apply_matches_trisolve():
    # direct_apply='inverse': one batched MXU matmul per solve, same answers
    from schwarz_tpu import Settings, generate_rhs, laplacian_2d, solve
    from schwarz_tpu.config import LocalSolver

    A = laplacian_2d(16)
    b = generate_rhs(A.n)
    base = Settings(overlap=3, tolerance=1e-8, max_iters=200,
                    local_solver=LocalSolver.direct_cholesky)
    r_tri = solve(A, b, base, num_subdomains=4)
    r_inv = solve(A, b, base.replace(direct_apply="inverse"),
                  num_subdomains=4)
    assert r_tri.converged and r_inv.converged
    assert abs(r_tri.iters - r_inv.iters) <= 1
    np.testing.assert_allclose(r_inv.solution, r_tri.solution,
                               rtol=1e-8, atol=1e-10)


def test_inverse_apply_requires_cholesky():
    import pytest as _pytest

    from schwarz_tpu import Settings, generate_rhs, laplacian_2d
    from schwarz_tpu.config import LocalSolver
    from schwarz_tpu.core.decompose import decompose
    from schwarz_tpu.ras import RASolver

    A = laplacian_2d(8)
    b = generate_rhs(A.n)
    s = Settings(overlap=2, local_solver=LocalSolver.direct_lu,
                 direct_apply="inverse", local_compute_dtype="float32")
    with _pytest.raises(ValueError, match="cholesky"):
        RASolver(decompose(A, b, s, 2))


@pytest.mark.slow
def test_blocked_trisolve_matches_dense():
    # blocked MXU substitution == plain trisolve to roundoff, at several
    # block shapes including the nb == 1 degenerate case
    from schwarz_tpu.solvers.direct import (
        block_diag_inverses,
        blocked_cholesky_solve,
        pick_trisolve_block,
    )

    rng = np.random.default_rng(7)
    S, R = 3, 96
    M = rng.standard_normal((S, R, R))
    A = M @ np.swapaxes(M, 1, 2) + R * np.eye(R)
    b = jnp.asarray(rng.standard_normal((S, R)))
    L = jnp.linalg.cholesky(jnp.asarray(A))
    expect = cholesky_solve(L, b)
    for blk in (8, 16, 32, 48, 96):
        Dinv = block_diag_inverses(L, blk)
        got = blocked_cholesky_solve(L, Dinv, b)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(expect), rtol=1e-9, atol=1e-9
        )
    assert pick_trisolve_block(1024) == 512
    assert pick_trisolve_block(640) == 128
    assert pick_trisolve_block(96) == 96
    with np.testing.assert_raises(Exception):
        block_diag_inverses(L, 7)


def test_blocked_apply_end_to_end():
    # direct_apply='blocked' through the full solver: same history as trisolve
    from schwarz_tpu import Settings, generate_rhs, laplacian_2d, solve
    from schwarz_tpu.config import LocalSolver

    A = laplacian_2d(16)
    b = generate_rhs(A.n)
    base = Settings(overlap=3, tolerance=1e-8, max_iters=200,
                    local_solver=LocalSolver.direct_cholesky)
    r_tri = solve(A, b, base, num_subdomains=4)
    r_blk = solve(A, b, base.replace(direct_apply="blocked"),
                  num_subdomains=4)
    assert r_tri.converged and r_blk.converged
    assert abs(r_tri.iters - r_blk.iters) <= 1
    np.testing.assert_allclose(r_blk.solution, r_tri.solution,
                               rtol=1e-8, atol=1e-10)
