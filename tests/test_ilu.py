"""ILU(0) preconditioner (solvers/precond.build_ilu0) — the ParILU role.

The reference offers ParILU among its local preconditioners
(solve.cpp:490-556).  Here the ILU(0) factorization runs once on the host at
setup (like CHOLMOD/UMFPACK, solve.cpp:92-173) and the apply expands each
triangular inverse into ``ilu_sweeps`` truncated-Neumann Jacobi sweeps —
SpMVs only (DIA shifts on banded operators), the standard iterative-trisolve
formulation for wide-vector hardware.  Tests: the factorization against a
dense reference ILU(0), sweep convergence to the exact triangular solves,
inner-CG iteration reduction, and the end-to-end solve.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from schwarz_tpu import Settings, generate_rhs, laplacian_2d, solve
from schwarz_tpu.config import LocalSolver, Precond
from schwarz_tpu.core.decompose import decompose
from schwarz_tpu.solvers.cg import cg_solve
from schwarz_tpu.solvers.precond import (
    build_ilu0,
    ilu_apply_ell,
    make_preconditioner,
)


def _dense(vals, cols, s):
    R = vals.shape[1]
    D = np.zeros((R, R))
    for i in range(R):
        for w in range(vals.shape[2]):
            if vals[s, i, w] != 0:
                D[i, cols[s, i, w]] += vals[s, i, w]
    return D


def _dense_ilu0(A):
    """Reference dense IKJ ILU(0) on A's pattern."""
    R = A.shape[0]
    pat = A != 0
    F = A.copy()
    for i in range(R):
        for k in range(i):
            if not pat[i, k] or F[k, k] == 0:
                continue
            F[i, k] /= F[k, k]
            for j in range(k + 1, R):
                if pat[i, j]:
                    F[i, j] -= F[i, k] * F[k, j]
    L = np.tril(F, -1) + np.eye(R)
    U = np.triu(F)
    return L, U


@pytest.fixture(scope="module")
def problem():
    A = laplacian_2d(16)
    b = generate_rhs(A.n, random=False)
    dec = decompose(A, b, Settings(overlap=2, row_pad_multiple=8), 4)
    return dec


def test_ilu0_matches_dense_reference(problem):
    dec = problem
    lv, lc, uv, uc, ud = build_ilu0(dec.lmat_vals, dec.lmat_cols)
    for s in range(2):
        A = _dense(dec.lmat_vals, dec.lmat_cols, s)
        Lr, Ur = _dense_ilu0(A)
        Lg = _dense(lv, lc, s) + np.eye(A.shape[0])
        Ug = _dense(uv, uc, s) + np.diag(ud[s])
        np.testing.assert_allclose(Lg, Lr, rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(Ug, Ur, rtol=1e-12, atol=1e-12)


def test_ilu_sweeps_converge_to_exact_triangular_solve(problem):
    dec = problem
    lv, lc, uv, uc, ud = build_ilu0(dec.lmat_vals, dec.lmat_cols)
    R = dec.lmat_vals.shape[1]
    rng = np.random.default_rng(3)
    r = rng.standard_normal((4, R))
    # exact z = U^-1 L^-1 r from the dense factors
    z_ref = np.zeros_like(r)
    for s in range(4):
        A = _dense(dec.lmat_vals, dec.lmat_cols, s)
        Lr, Ur = _dense_ilu0(A)
        z_ref[s] = np.linalg.solve(Ur, np.linalg.solve(Lr, r[s]))
    errs = []
    for sweeps in (1, 3, R):
        z = np.asarray(ilu_apply_ell(
            jnp.asarray(lv), jnp.asarray(lc), jnp.asarray(uv),
            jnp.asarray(uc), jnp.asarray(1.0 / ud), jnp.asarray(r), sweeps))
        errs.append(np.linalg.norm(z - z_ref) / np.linalg.norm(z_ref))
    assert errs[1] < errs[0]          # more sweeps, closer
    assert errs[2] < 1e-10            # R sweeps = exact (nilpotent factors)


def test_ilu_cuts_inner_cg_iterations(problem):
    dec = problem
    vals = jnp.asarray(dec.lmat_vals)
    cols = jnp.asarray(dec.lmat_cols)
    rhs = jnp.asarray(dec.local_rhs)
    x0 = jnp.zeros_like(rhs)

    def iters(precond):
        s = Settings(precond=precond)
        M = make_preconditioner(s, vals, cols)
        res = cg_solve(vals, cols, rhs, x0, 1e-8, 500, precond=M)
        return int(np.max(np.asarray(res.iters)))

    it_ilu = iters(Precond.ilu)
    it_none = iters(Precond.none)
    assert it_ilu < it_none, (it_ilu, it_none)


def test_ilu_end_to_end_solve():
    A = laplacian_2d(24)
    b = generate_rhs(A.n)
    r = solve(
        A, b,
        Settings(local_solver=LocalSolver.iterative_cg, overlap=3,
                 tolerance=1e-6, precond=Precond.ilu, ilu_sweeps=3,
                 local_max_iters=8, local_tolerance=0.1, max_iters=300),
        num_subdomains=4,
    )
    assert r.converged
    assert r.relative_residual_norm < 1e-5


def test_ilu_cli_parilu_alias(tmp_path, capsys):
    from schwarz_tpu.cli import main as cli_main

    rc = cli_main([
        "--explicit_laplacian", "--set_1d_laplacian_size", "16",
        "--num_subdomains", "4", "--overlap", "2", "--set_tol", "1e-5",
        "--local_solver", "cg", "--local_precond", "parilu",
        "--local_max_iters", "8",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert '"converged": true' in out
