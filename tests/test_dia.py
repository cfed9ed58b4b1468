"""DIA(+remainder) operator tests: must match the ELL SpMV exactly, and the
DIA-routed solve must match the ELL-routed solve (ops/dia.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from schwarz_tpu import Settings, generate_rhs, laplacian_2d, solve
from schwarz_tpu.core.decompose import decompose
from schwarz_tpu.models import anisotropic_diffusion_2d, read_mtx
from schwarz_tpu.ops.dia import dia_ell_spmv, split_dia_ell
from schwarz_tpu.ops.spmv import ell_spmv_batched

from schwarz_tpu.models import matrix_path

ANI3 = matrix_path("ani3_crop.mtx")


@pytest.mark.parametrize("gen", [laplacian_2d, anisotropic_diffusion_2d])
def test_dia_spmv_matches_ell(gen):
    A = gen(12)
    b = generate_rhs(A.n)
    dec = decompose(A, b, Settings(overlap=3), 4)
    hyb = split_dia_ell(dec.lmat_vals, dec.lmat_cols, dec.rows_count)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((4, dec.meta.max_ext)))
    y_ell = ell_spmv_batched(
        jnp.asarray(dec.lmat_vals), jnp.asarray(dec.lmat_cols),
        jnp.asarray(x[:, : dec.meta.max_rows]),
    )
    y_dia = dia_ell_spmv(
        hyb.offsets, jnp.asarray(hyb.dia_vals), jnp.asarray(hyb.rem_rows),
        jnp.asarray(hyb.rem_vals), jnp.asarray(hyb.rem_cols), x,
    )
    np.testing.assert_allclose(np.asarray(y_dia), np.asarray(y_ell), atol=1e-12)


def test_dia_extraction_covers_stencil():
    A = laplacian_2d(16)
    b = generate_rhs(A.n)
    dec = decompose(A, b, Settings(overlap=3), 4)
    hyb = split_dia_ell(dec.lmat_vals, dec.lmat_cols, dec.rows_count)
    dia_nnz = int((hyb.dia_vals != 0).sum())
    total = int((dec.lmat_vals != 0).sum())
    # interior of a regular-partitioned 5-pt stencil is fully diagonal-captured
    assert dia_nnz / total > 0.8
    assert len(hyb.offsets) <= 12
    # remainder covers far fewer rows than the full matrix
    assert hyb.rem_rows.shape[1] < dec.meta.max_rows / 2


def test_dia_solve_matches_ell_solve():
    A = laplacian_2d(16)
    b = generate_rhs(A.n)
    base = Settings(overlap=3, tolerance=1e-8, max_iters=200)
    r_dia = solve(A, b, base.replace(spmv_format="dia"), num_subdomains=4)
    r_ell = solve(A, b, base.replace(spmv_format="ell"), num_subdomains=4)
    assert r_dia.converged and r_ell.converged
    assert r_dia.iters == r_ell.iters
    np.testing.assert_allclose(r_dia.solution, r_ell.solution, atol=1e-10)


@pytest.mark.skipif(
    not __import__("os").path.exists(ANI3), reason="reference matrices absent"
)
def test_dia_unstructured_fem_graceful():
    # ani3 is unstructured FEM: auto mode may or may not pick DIA, but the
    # solve must stay correct either way
    A = read_mtx(ANI3)
    b = generate_rhs(A.n)
    r = solve(A, b, Settings(overlap=3, spmv_format="auto"), num_subdomains=2)
    assert r.converged
    assert r.relative_residual_norm < 1e-4
