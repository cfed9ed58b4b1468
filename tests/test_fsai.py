"""FSAI(0) preconditioner (solvers/precond.build_fsai).

The reference offers block-Jacobi / ParILU / ISAI local preconditioners
(solve.cpp:490-556).  FSAI is the SPD-safe factorized counterpart of ISAI
and the TPU-native ParILU replacement: M = G^T G ~= A^-1 applied as two
sparse matvecs (gather-free DIA shifts on banded operators), never a
triangular substitution.  Tests: factor structure, conditioning vs Jacobi,
inner-CG iteration reduction, exact ELL->DIA conversion, the DIA apply
path, and the end-to-end win under capped two-stage local solves.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from schwarz_tpu import Settings, generate_rhs, laplacian_2d, solve
from schwarz_tpu.config import LocalSolver, Precond
from schwarz_tpu.core.decompose import decompose
from schwarz_tpu.solvers.cg import cg_solve
from schwarz_tpu.solvers.precond import (
    build_fsai,
    ell_to_dia,
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


@pytest.fixture(scope="module")
def problem():
    A = laplacian_2d(16)
    b = generate_rhs(A.n, random=False)
    dec = decompose(A, b, Settings(overlap=2), 4)
    return A, b, dec


def test_fsai_factor_structure(problem):
    _, _, dec = problem
    glv, glc, guv, guc = build_fsai(dec.lmat_vals, dec.lmat_cols)
    for s in range(4):
        G = _dense(glv, glc, s)
        GT = _dense(guv, guc, s)
        assert np.allclose(G, np.tril(G)), "G must be lower triangular"
        assert np.allclose(GT, G.T), "gu arrays must hold exactly G^T"
        # every row carries a positive diagonal (identity on padding rows)
        assert (np.diag(G) > 0).all()


def test_fsai_conditioning_beats_jacobi(problem):
    _, _, dec = problem
    glv, glc, _, _ = build_fsai(dec.lmat_vals, dec.lmat_cols)
    A0 = _dense(dec.lmat_vals, dec.lmat_cols, 0)
    G = _dense(glv, glc, 0)
    nz = np.abs(np.diag(A0)) > 0
    M = G.T @ G
    d = np.diag(A0).copy()
    d[~nz] = 1.0
    ev_f = np.linalg.eigvals((M @ A0)[np.ix_(nz, nz)]).real
    ev_j = np.linalg.eigvals((np.diag(1.0 / d) @ A0)[np.ix_(nz, nz)]).real
    assert ev_f.min() > 0, "preconditioned spectrum must stay positive (SPD)"
    assert ev_f.max() / ev_f.min() < ev_j.max() / ev_j.min()


def test_fsai_cg_fewer_iterations(problem):
    _, _, dec = problem
    vals = jnp.asarray(dec.lmat_vals)
    cols = jnp.asarray(dec.lmat_cols)
    rhs = jnp.asarray(
        np.random.default_rng(0).standard_normal((4, dec.meta.max_rows))
    )
    x0 = jnp.zeros_like(rhs)

    def iters(pc):
        M = make_preconditioner(Settings(precond=pc), vals, cols)
        res = cg_solve(vals, cols, rhs, x0, 1e-8, 500, precond=M)
        return int(np.asarray(res.iters).max())

    assert iters(Precond.fsai) < iters(Precond.none)


def test_ell_to_dia_exact(problem):
    _, _, dec = problem
    glv, glc, guv, guc = build_fsai(dec.lmat_vals, dec.lmat_cols)
    for vv, cc in ((glv, glc), (guv, guc)):
        offs, dia = ell_to_dia(vv, cc)
        R = vv.shape[1]
        x = np.arange(R, dtype=float)
        for s in range(4):
            y_ref = _dense(vv, cc, s) @ x
            y = np.zeros(R)
            for k, o in enumerate(offs):
                idx = np.arange(R) + o
                ok = (idx >= 0) & (idx < R)
                y[ok] += dia[s, k, ok] * x[idx[ok]]
            np.testing.assert_allclose(y, y_ref, atol=1e-12)


def test_fsai_dia_apply_path():
    # spmv_format='dia' routes the apply through gather-free DIA shifts;
    # it must match the dense G^T G reference exactly
    from schwarz_tpu.ras import RASolver

    A = laplacian_2d(16)
    b = generate_rhs(A.n, random=False)
    s = Settings(overlap=2, spmv_format="dia", row_pad_multiple=128,
                 local_solver=LocalSolver.iterative_cg, precond=Precond.fsai)
    dec = decompose(A, b, s, 4)
    solver = RASolver(dec)
    assert "fsai_gl_dia" in solver._plan, "DIA operator must take the DIA path"
    fn = solver._precond_fn(solver._plan)
    r = np.random.default_rng(1).standard_normal((4, dec.meta.max_rows))
    z = np.asarray(fn(jnp.asarray(r)))
    glv, glc, _, _ = build_fsai(dec.lmat_vals, dec.lmat_cols)
    for ss in range(4):
        G = _dense(glv, glc, ss)
        np.testing.assert_allclose(z[ss], G.T @ (G @ r[ss]), atol=1e-10)


def test_fsai_capped_two_stage_fewer_outers():
    # the production configuration (capped inexact locals): a stronger
    # approximate inverse buys outer iterations (measured 393 -> 168 at
    # 64^2/16, cap 6); comparative assertion on a smaller instance
    A = laplacian_2d(32)
    b = generate_rhs(A.n, random=False)

    def outers(pc):
        s = Settings(overlap=3, tolerance=1e-6, max_iters=500,
                     local_solver=LocalSolver.iterative_cg, precond=pc,
                     local_tolerance=1e-10, local_max_iters=6)
        r = solve(A, b, s, num_subdomains=4)
        assert r.converged
        assert r.relative_residual_norm < 1e-5
        return r.iters

    assert outers(Precond.fsai) < outers(Precond.jacobi)


def test_fsai_cli_choice():
    from schwarz_tpu.cli import build_parser, settings_from_args

    p = build_parser()
    args = p.parse_args(
        ["--explicit_laplacian", "--use_precond", "--precond", "fsai"]
    )
    s = settings_from_args(args)
    assert s.precond == Precond.fsai


def test_fsai_dia_path_with_remainder_stays_banded():
    # regular-2D closure gives the DIA operator an ELL remainder; the FSAI
    # pattern is restricted to the DIA offsets so both factors stay banded
    # (bounded offsets) and the solve still converges
    from schwarz_tpu.config import Partition
    from schwarz_tpu.core.decompose import decompose as _dec
    from schwarz_tpu.ras import RASolver

    A = laplacian_2d(16)
    b = generate_rhs(A.n, random=False)
    s = Settings(overlap=2, partition=Partition.regular2d,
                 spmv_format="dia", row_pad_multiple=128,
                 tolerance=1e-6, max_iters=400,
                 local_solver=LocalSolver.iterative_cg,
                 precond=Precond.fsai, local_max_iters=8,
                 local_tolerance=1e-10)
    dec = _dec(A, b, s, 4)
    solver = RASolver(dec)
    if "fsai_gl_dia" in solver._plan:
        go, uo = solver._fsai_offsets
        K = len(solver._dia_offsets)
        assert len(go) <= K and len(uo) <= K
    r = solve(A, b, s, num_subdomains=4)
    assert r.converged
    assert r.relative_residual_norm < 1e-5
