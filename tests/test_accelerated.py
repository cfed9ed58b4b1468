"""Krylov-accelerated solve (FGMRES with RAS preconditioner) — must cut outer
iterations several-fold over the stationary fixed point and stay correct."""

import numpy as np
import pytest
import scipy.sparse.linalg as spla

from schwarz_tpu import (
    CommSettings,
    HaloStrategy,
    LocalSolver,
    Partition,
    Settings,
    advection_diffusion_2d,
    generate_rhs,
    laplacian_2d,
    solve,
)
from schwarz_tpu.core.decompose import decompose
from schwarz_tpu.ras import RASolver


@pytest.mark.slow
def test_fgmres_accelerated_beats_stationary():
    A = laplacian_2d(48)
    b = generate_rhs(A.n)
    s = Settings(partition=Partition.regular2d, overlap=4, tolerance=1e-8,
                 max_iters=400, restart_iter=30, two_level=True,
                 dtype="float64")
    solver = RASolver(decompose(A, b, s, 16))
    r_stat = solver.run()
    r_acc = solver.run_accelerated()
    assert r_stat.converged and r_acc.converged
    assert r_acc.iters < r_stat.iters / 2
    x_ref = spla.spsolve(A.to_scipy().tocsc(), b)
    np.testing.assert_allclose(r_acc.solution, x_ref, rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_fgmres_nonsymmetric():
    A = advection_diffusion_2d(24)
    b = generate_rhs(A.n)
    s = Settings(
        overlap=3, tolerance=1e-8, max_iters=300, restart_iter=30,
        local_solver=LocalSolver.iterative_gmres, non_symmetric_matrix=True,
        accelerator="fgmres",
    )
    r = solve(A, b, s, num_subdomains=4)
    assert r.converged
    assert r.relative_residual_norm < 1e-7


def test_fgmres_with_mixed_precision_inner():
    # FGMRES + f32 local solves under f64: the flexible variant tolerates the
    # inexact low-precision preconditioner
    A = laplacian_2d(32)
    b = generate_rhs(A.n)
    s = Settings(
        overlap=4, tolerance=1e-8, max_iters=300, restart_iter=30,
        dtype="float64", local_compute_dtype="float32",
        local_tolerance=1e-4, accelerator="fgmres", two_level=True,
    )
    r = solve(A, b, s, num_subdomains=4)
    assert r.converged
    assert r.relative_residual_norm < 1e-7


def test_fgmres_metis_multiple_subdomains_per_device():
    import jax

    from schwarz_tpu.parallel.mesh import make_mesh

    A = laplacian_2d(24)
    b = generate_rhs(A.n)
    s = Settings(partition=Partition.metis, overlap=3, tolerance=1e-8,
                 max_iters=300, restart_iter=25, accelerator="fgmres")
    dec = decompose(A, b, s, 8)
    r = RASolver(dec, mesh=make_mesh(jax.devices()[:4])).run_accelerated()
    assert r.converged
    x_ref = spla.spsolve(A.to_scipy().tocsc(), b)
    np.testing.assert_allclose(r.solution, x_ref, rtol=1e-5, atol=1e-6)


def test_fgmres_neighbor_strategy():
    A = laplacian_2d(24)
    b = generate_rhs(A.n)
    s = Settings(overlap=3, tolerance=1e-8, max_iters=300, restart_iter=20,
                 comm=CommSettings(strategy=HaloStrategy.neighbor),
                 accelerator="fgmres")
    r = solve(A, b, s, num_subdomains=8)
    assert r.converged
    assert r.relative_residual_norm < 1e-7


@pytest.mark.slow
def test_fgmres_solves_helmholtz_where_stationary_diverges():
    """Indefinite Helmholtz: the stationary RAS iteration diverges (as it
    would in the stationary-only reference), but FGMRES with the RAS
    preconditioner converges — and O-RAS Robin conditions (absorbing-ish
    boundaries, the classic Helmholtz remedy) cut iterations further."""
    import numpy as np
    from schwarz_tpu import Settings, generate_rhs, solve
    from schwarz_tpu.config import LocalSolver
    from schwarz_tpu.models import helmholtz_2d

    A = helmholtz_2d(32)
    b = generate_rhs(A.n)
    base = Settings(overlap=3, tolerance=1e-8, max_iters=200,
                    local_solver=LocalSolver.iterative_gmres)
    r_st = solve(A, b, base.replace(max_iters=120), num_subdomains=4)
    assert not r_st.converged     # stationary diverges/stalls on Helmholtz
    r_k = solve(A, b, base.replace(accelerator="fgmres"), num_subdomains=4)
    r_ko = solve(A, b, base.replace(accelerator="fgmres", oras_weight=-0.5),
                 num_subdomains=4)
    for r in (r_k, r_ko):
        assert r.converged
        x = np.asarray(r.solution)
        res = np.linalg.norm(A.to_scipy() @ x - np.asarray(b))
        assert res / np.linalg.norm(np.asarray(b)) < 1e-6
    assert r_ko.iters <= r_k.iters


def test_fgmres_overlap1_exact_operator():
    # regression (ADVICE r1): the FGMRES matvec must include the interface
    # term — at overlap=1 interior rows carry interface entries and dropping
    # them makes the operator block-diagonal (converged=True, wrong answer)
    A = laplacian_2d(24)
    b = generate_rhs(A.n)
    s = Settings(overlap=1, tolerance=1e-8, max_iters=400, restart_iter=40,
                 dtype="float64", accelerator="fgmres")
    r = solve(A, b, s, num_subdomains=4)
    assert r.converged
    assert r.relative_residual_norm < 1e-7
    x_ref = spla.spsolve(A.to_scipy().tocsc(), b)
    np.testing.assert_allclose(r.solution, x_ref, rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_fgmres_chunked_matches_unchunked_and_resumes(tmp_path):
    # chunk_iters bounds each execution at restart-cycle granularity with
    # identical results; checkpoint/resume continues a capped solve
    A = laplacian_2d(32)
    b = generate_rhs(A.n)
    s = Settings(overlap=3, tolerance=1e-8, max_iters=200, restart_iter=10,
                 dtype="float64")
    solver = RASolver(decompose(A, b, s, 4))
    r_full = solver.run_accelerated()
    r_chunk = solver.run_accelerated(chunk_iters=20)
    assert r_full.converged and r_chunk.converged
    assert r_full.iters == r_chunk.iters
    np.testing.assert_allclose(r_chunk.solution, r_full.solution, atol=1e-12)

    # cap the budget, checkpoint, resume to completion
    s_cap = s.replace(max_iters=10)
    solver_cap = RASolver(decompose(A, b, s_cap, 4))
    ck = str(tmp_path / "accel.npz")
    r_cap = solver_cap.run_accelerated(checkpoint_path=ck)
    assert not r_cap.converged
    state = solver.load_accel_checkpoint(ck)
    r_res = solver.run_accelerated(resume_state=state)
    assert r_res.converged
    # resumed from iteration 10: total extra iterations bounded
    assert int(r_res.iters) <= r_full.iters + int(r_cap.iters) + 1
    np.testing.assert_allclose(r_res.solution, r_full.solution, atol=1e-8)


def test_fgmres_instrumented_stage_timings():
    A = laplacian_2d(24)
    b = generate_rhs(A.n)
    s = Settings(overlap=3, tolerance=1e-6, max_iters=100, restart_iter=15,
                 comm=CommSettings(strategy=HaloStrategy.neighbor))
    solver = RASolver(decompose(A, b, s, 4))
    r = solver.run_accelerated(instrument=True)
    assert r.converged
    assert set(r.stage_timings) == {"accel_matvec", "accel_precond"}
    for v in r.stage_timings.values():
        assert v["avg"] > 0 and v["min"] <= v["med"] <= v["max"]
