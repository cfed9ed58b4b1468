"""inner_operator='dia_only' — remainder-free inner solves (solve/check
split): sound only in the residual/correction form; the constructor rejects
the solution-based combination (measured: shifted fixed point, global check
stalls).  dia_max_diags tunes the DIA/remainder split."""

import dataclasses

import numpy as np
import pytest

from schwarz_tpu import Settings, generate_rhs, laplacian_2d, solve
from schwarz_tpu.config import LocalCriterion, Partition


def _res_crit(s):
    return s.replace(convergence=dataclasses.replace(
        s.convergence, criterion=LocalCriterion.residual_based))


def test_dia_only_requires_residual_criterion():
    A = laplacian_2d(16)
    b = generate_rhs(A.n)
    with pytest.raises(ValueError, match="residual-based"):
        solve(A, b, Settings(spmv_format="dia", inner_operator="dia_only"),
              num_subdomains=4)
    with pytest.raises(ValueError, match="'exact' or 'dia_only'"):
        solve(A, b, Settings(spmv_format="dia", inner_operator="fast"),
              num_subdomains=4)


def test_dia_only_residual_form_converges_exactly():
    A = laplacian_2d(32)
    b = generate_rhs(A.n)
    base = _res_crit(Settings(
        partition=Partition.regular2d, overlap=4, tolerance=1e-6,
        max_iters=500, spmv_format="dia", local_max_iters=20,
    ))
    r = solve(A, b, base.replace(inner_operator="dia_only"), num_subdomains=4)
    assert r.converged
    x = np.asarray(r.solution)
    res = np.linalg.norm(A.to_scipy() @ x - np.asarray(b))
    assert res / np.linalg.norm(np.asarray(b)) < 1e-5


def test_dia_max_diags_shrinks_remainder():
    from schwarz_tpu.core.decompose import decompose
    from schwarz_tpu.ops.dia import split_dia_ell

    A = laplacian_2d(32)
    b = generate_rhs(A.n)
    s = Settings(partition=Partition.regular2d, overlap=4)
    dec = decompose(A, b, s, 4)
    h16 = split_dia_ell(dec.lmat_vals, dec.lmat_cols, dec.rows_count,
                        max_diags=16, min_fill=0.0)
    h40 = split_dia_ell(dec.lmat_vals, dec.lmat_cols, dec.rows_count,
                        max_diags=40, min_fill=0.0)
    assert np.count_nonzero(h40.rem_vals) < np.count_nonzero(h16.rem_vals)
    # solves agree regardless of the split point
    r16 = solve(A, b, s.replace(tolerance=1e-8, max_iters=400,
                                spmv_format="dia"), num_subdomains=4)
    r40 = solve(A, b, s.replace(tolerance=1e-8, max_iters=400,
                                spmv_format="dia", dia_max_diags=40),
                num_subdomains=4)
    assert r16.converged and r40.converged
    np.testing.assert_allclose(r16.solution, r40.solution, atol=1e-7)
