"""Fused whole-solve CG Pallas kernel (ops/fused_cg.py): must match the XLA
batched CG (solvers/cg.py) on the gated case, and the end-to-end fused solve
must match the unfused solve.  Interpret mode on the CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from schwarz_tpu import Settings, generate_rhs, laplacian_2d, solve
from schwarz_tpu.config import LocalSolver, Precond
from schwarz_tpu.core.decompose import decompose
from schwarz_tpu.ops.dia import split_dia_ell
from schwarz_tpu.ops.fused_cg import fused_cg_solve, fused_cg_supported
from schwarz_tpu.solvers.cg import cg_solve


def _pure_dia_problem(n=24, subd=4, overlap=2):
    A = laplacian_2d(n)
    b = generate_rhs(A.n)
    s = Settings(overlap=overlap, row_pad_multiple=128, dtype="float32")
    dec = decompose(A, b, s, subd)
    hyb = split_dia_ell(
        dec.lmat_vals, dec.lmat_cols, dec.rows_count, max_diags=40,
        min_fill=0.0,
    )
    assert int(np.count_nonzero(hyb.rem_vals)) == 0, (
        "regular-1D sorted-closure should be pure-DIA"
    )
    return dec, hyb


def test_fused_matches_xla_cg():
    dec, hyb = _pure_dia_problem()
    S, K, R = hyb.dia_vals.shape
    dia = jnp.asarray(hyb.dia_vals, jnp.float32)
    rng = np.random.default_rng(3)
    bb = jnp.asarray(
        rng.standard_normal((S, R)) * np.asarray(dec.masks()[0]), jnp.float32
    )
    x0 = jnp.zeros_like(bb)

    def apply_fn(x):
        from schwarz_tpu.ops.dia import dia_ell_spmv
        return dia_ell_spmv(
            hyb.offsets, dia, jnp.asarray(hyb.rem_rows),
            jnp.asarray(hyb.rem_vals, jnp.float32),
            jnp.asarray(hyb.rem_cols), x,
        )

    ref = cg_solve(None, None, bb, x0, 1e-6, 200, apply_fn=apply_fn)
    got = fused_cg_solve(
        hyb.offsets, dia, bb, x0, None, 1e-6, jnp.int32(200),
        has_dinv=False, interpret=True,
    )
    # same math, different reduction order: solutions agree to f32 levels and
    # the iteration counts match exactly (convergence is not marginal)
    np.testing.assert_allclose(
        np.asarray(got.x), np.asarray(ref.x), rtol=0, atol=5e-4
    )
    assert int(np.abs(got.iters - ref.iters).max()) <= 1
    assert np.all(np.asarray(got.rel_resnorm) <= 1e-6 + 1e-8)


def test_fused_jacobi_precond():
    dec, hyb = _pure_dia_problem()
    S, K, R = hyb.dia_vals.shape
    dia = jnp.asarray(hyb.dia_vals, jnp.float32)
    k0 = hyb.offsets.index(0)
    d = hyb.dia_vals[:, k0, :]
    dinv = jnp.asarray(
        np.where(np.abs(d) > 0, 1.0 / np.where(d == 0, 1.0, d), 1.0),
        jnp.float32,
    )
    rng = np.random.default_rng(5)
    bb = jnp.asarray(
        rng.standard_normal((S, R)) * np.asarray(dec.masks()[0]), jnp.float32
    )
    x0 = jnp.zeros_like(bb)

    def apply_fn(x):
        from schwarz_tpu.ops.dia import dia_ell_spmv
        return dia_ell_spmv(
            hyb.offsets, dia, jnp.asarray(hyb.rem_rows),
            jnp.asarray(hyb.rem_vals, jnp.float32),
            jnp.asarray(hyb.rem_cols), x,
        )

    ref = cg_solve(
        None, None, bb, x0, 1e-6, 200,
        precond=lambda r: dinv * r, apply_fn=apply_fn,
    )
    got = fused_cg_solve(
        hyb.offsets, dia, bb, x0, dinv, 1e-6, jnp.int32(200),
        has_dinv=True, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got.x), np.asarray(ref.x), rtol=0, atol=5e-4
    )
    assert int(np.abs(got.iters - ref.iters).max()) <= 1


def test_fused_warm_start_and_budget():
    dec, hyb = _pure_dia_problem()
    S, K, R = hyb.dia_vals.shape
    dia = jnp.asarray(hyb.dia_vals, jnp.float32)
    rng = np.random.default_rng(7)
    bb = jnp.asarray(
        rng.standard_normal((S, R)) * np.asarray(dec.masks()[0]), jnp.float32
    )
    x0 = jnp.asarray(
        rng.standard_normal((S, R)) * np.asarray(dec.masks()[0]) * 0.1,
        jnp.float32,
    )
    # budget-limited: stops at exactly max_iters
    got = fused_cg_solve(
        hyb.offsets, dia, bb, x0, None, 1e-12, jnp.int32(3),
        has_dinv=False, interpret=True,
    )
    assert int(got.iters.max()) == 3
    # converged-at-entry: b == A x0 -> zero iterations
    from schwarz_tpu.ops.dia import dia_ell_spmv
    bx = dia_ell_spmv(
        hyb.offsets, dia, jnp.asarray(hyb.rem_rows),
        jnp.asarray(hyb.rem_vals, jnp.float32), jnp.asarray(hyb.rem_cols), x0,
    )
    got0 = fused_cg_solve(
        hyb.offsets, dia, bx, x0, None, 1e-6, jnp.int32(50),
        has_dinv=False, interpret=True,
    )
    assert int(got0.iters.max()) == 0
    np.testing.assert_allclose(
        np.asarray(got0.x), np.asarray(x0), atol=1e-6
    )


@pytest.mark.parametrize("precond", ["none", "jacobi"])
def test_fused_end_to_end_matches_unfused(precond):
    A = laplacian_2d(20)
    b = generate_rhs(A.n)
    base = Settings(
        overlap=3, tolerance=1e-5, max_iters=300, dtype="float32",
        local_solver=LocalSolver.iterative_cg, local_tolerance=1e-7,
        row_pad_multiple=128, spmv_format="dia",
        precond=Precond(precond),
    )
    r_ref = solve(A, b, base, num_subdomains=4)
    r_fused = solve(A, b, base.replace(fused_local_cg=True), num_subdomains=4)
    assert r_ref.converged and r_fused.converged
    assert abs(r_fused.iters - r_ref.iters) <= 1
    np.testing.assert_allclose(
        r_fused.solution, r_ref.solution, rtol=0, atol=5e-4
    )


def test_fused_gate_rejects_unsupported():
    A = laplacian_2d(16)
    b = generate_rhs(A.n)
    # wrong solver
    with pytest.raises(ValueError, match="local_solver='cg'"):
        solve(A, b, Settings(
            fused_local_cg=True, local_solver=LocalSolver.iterative_gmres,
            row_pad_multiple=128, spmv_format="dia",
        ), num_subdomains=4)
    # rows not 128-aligned
    with pytest.raises(ValueError, match="requirements not met"):
        solve(A, b, Settings(
            fused_local_cg=True, local_solver=LocalSolver.iterative_cg,
            row_pad_multiple=8, spmv_format="dia", dtype="float32",
        ), num_subdomains=4)
    # f64 local compute
    with pytest.raises(ValueError, match="requirements not met"):
        solve(A, b, Settings(
            fused_local_cg=True, local_solver=LocalSolver.iterative_cg,
            row_pad_multiple=128, spmv_format="dia", dtype="float64",
        ), num_subdomains=4)


def test_fused_supported_predicate():
    assert fused_cg_supported(16, 1792, 5, jnp.float32, False, "none")
    assert fused_cg_supported(16, 1792, 5, jnp.float32, False, "jacobi")
    assert not fused_cg_supported(16, 1792, 5, jnp.float64, False, "none")
    assert not fused_cg_supported(16, 1792, 5, jnp.float32, True, "none")
    assert not fused_cg_supported(16, 1792, 5, jnp.float32, False,
                                  "block_jacobi")
    assert not fused_cg_supported(16, 1000, 5, jnp.float32, False, "none")
    # VMEM blow-out
    assert not fused_cg_supported(16, 70656, 16, jnp.float32, False, "none")


def test_fused_mixed_precision_ir():
    """f64 outer + f32 fused inner (iterative refinement) reaches f64 targets."""
    A = laplacian_2d(20)
    b = generate_rhs(A.n)
    base = Settings(
        overlap=3, tolerance=1e-9, max_iters=400, dtype="float64",
        local_compute_dtype="float32",
        local_solver=LocalSolver.iterative_cg, local_tolerance=1e-6,
        row_pad_multiple=128, spmv_format="dia",
    )
    r = solve(A, b, base.replace(fused_local_cg=True), num_subdomains=4)
    assert r.converged
    x = np.asarray(r.solution)
    res = np.linalg.norm(A.to_scipy() @ x - np.asarray(b))
    assert res / np.linalg.norm(np.asarray(b)) < 1e-8
