"""Iterative-refinement restarts around the f32 free-running kernels
(ops/async_ras.iterative_refinement_run).

The free-running analogue of the synchronous path's two-precision split
(reference ValueType/ValueTypeInternal, include/schwarz/config.hpp): the
f32 kernel solves correction equations at a moderate relative tolerance
while f64 true residuals are recomputed between launches, so free-running
hardware iterations reach tolerances far below the f32 floor (~1e-5).
Covers all three kernels (1-D banded, 2-D block grid, general graph), the
RHS-repack fast path, and the solve()/CLI auto-dispatch.
"""

import numpy as np
import pytest
import scipy.sparse.linalg as spla

from schwarz_tpu import generate_rhs, laplacian_2d, solve
from schwarz_tpu.config import CommSettings, Partition, Settings
from schwarz_tpu.core.partition import make_partition
from schwarz_tpu.ops.async_ras import AsyncRASolver, build_async_plan
from schwarz_tpu.ops.async_ras_2d import AsyncRASolver2D
from schwarz_tpu.ops.async_ras_general import (
    AsyncGeneralRASolver,
    build_general_plan,
)


# whole-module slow tier: multi-minute free-running solves
pytestmark = pytest.mark.slow


def test_set_rhs_matches_fresh_plan_1d():
    A = laplacian_2d(16)
    b1 = generate_rhs(A.n, random=False)
    rng = np.random.default_rng(7)
    b2 = rng.standard_normal(A.n)
    s = AsyncRASolver(A, b1, num_subdomains=4, overlap=2, tolerance=1e-4)
    s.set_rhs(b2)
    fresh = build_async_plan(A, b2, 4, 2)
    np.testing.assert_array_equal(s.plan.b, fresh.b)
    np.testing.assert_array_equal(np.asarray(s._dev["b"]), fresh.b)


def test_set_rhs_matches_fresh_plan_general():
    A = laplacian_2d(12)
    b1 = generate_rhs(A.n, random=False)
    rng = np.random.default_rng(8)
    b2 = rng.standard_normal(A.n)
    part = make_partition(A, 4, Settings(partition=Partition.metis))
    s = AsyncGeneralRASolver(A, b1, 4, overlap=2, tolerance=1e-4,
                             part=part)
    s.set_rhs(b2)
    fresh = build_general_plan(A, b2, part, 2)
    np.testing.assert_array_equal(s.plan.b, fresh.b)


def test_set_rhs_matches_fresh_plan_2d():
    from schwarz_tpu.ops.async_ras_2d import build_async_plan_2d

    A = laplacian_2d(64)
    b1 = generate_rhs(A.n, random=False)
    rng = np.random.default_rng(9)
    b2 = rng.standard_normal(A.n)
    s = AsyncRASolver2D(A, b1, px=2, py=2, tolerance=1e-3)
    s.set_rhs(b2)
    fresh = build_async_plan_2d(A, b2, 2, 2)
    np.testing.assert_array_equal(s.plan.b, fresh.b)


def test_refined_1d_reaches_f64_tolerance():
    # the f32 kernel floors near 1e-5 relative; refinement must push the
    # TRUE residual to 1e-10 in a handful of restarts
    A = laplacian_2d(16)
    b = generate_rhs(A.n, random=False)
    s = AsyncRASolver(A, b, num_subdomains=4, overlap=2, tolerance=1e-4,
                      ninner=20, chunk_rounds=8)
    x, info = s.run_refined(tol=1e-10, max_rounds=300)
    assert info["converged"], info
    assert info["relative_residual_norm"] <= 1e-10
    assert info["restarts"] >= 2, "one f32 solve cannot reach 1e-10"
    x_ref = spla.spsolve(A.to_scipy().tocsc(), b)
    err = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
    assert err < 1e-9, err
    # the solver is reusable afterwards: original RHS restored
    np.testing.assert_array_equal(s.rhs, b)


def test_refined_general_unstructured():
    A = laplacian_2d(12)
    b = generate_rhs(A.n, random=False)
    part = make_partition(A, 4, Settings(partition=Partition.metis))
    s = AsyncGeneralRASolver(A, b, 4, overlap=2, tolerance=1e-4,
                             staleness=1, ninner=12, chunk_rounds=8,
                             part=part)
    x, info = s.run_refined(tol=1e-9, max_rounds=300)
    assert info["converged"], info
    assert info["relative_residual_norm"] <= 1e-9
    assert info["restarts"] >= 2


def test_refined_2d_block_grid():
    A = laplacian_2d(64)
    b = generate_rhs(A.n, random=False)
    s = AsyncRASolver2D(A, b, px=2, py=2, tolerance=1e-4, ninner=30,
                        chunk_rounds=16)
    x, info = s.run_refined(tol=1e-9, max_rounds=400)
    assert info["converged"], info
    assert info["relative_residual_norm"] <= 1e-9


def test_refined_checkpoint_resume(tmp_path):
    A = laplacian_2d(16)
    b = generate_rhs(A.n, random=False)
    kw = dict(num_subdomains=4, overlap=2, tolerance=1e-4, ninner=20,
              chunk_rounds=8)
    ck = str(tmp_path / "ir.npz")
    s1 = AsyncRASolver(A, b, **kw)
    # cap restarts so the run stops short of the target
    x1, info1 = s1.run_refined(tol=1e-12, max_restarts=1, max_rounds=300,
                               checkpoint_path=ck)
    assert not info1["converged"]
    s2 = AsyncRASolver(A, b, **kw)
    x2, info2 = s2.run_refined(tol=1e-10, max_rounds=300,
                               resume_state=np.load(ck)["ir_x"])
    assert info2["converged"], info2
    assert info2["relative_residual_norm"] <= 1e-10


def test_solve_dispatch_auto_refines_below_f32_floor():
    # solve(free_running=True, tolerance<1e-5) must auto-switch to the
    # refined driver and report the TRUE residual at the target
    A = laplacian_2d(16)
    b = generate_rhs(A.n, random=False)
    st = Settings(free_running=True, tolerance=1e-9, overlap=2,
                  max_iters=400, local_max_iters=20,
                  comm=CommSettings(staleness=1))
    r = solve(A, b, st, num_subdomains=4)
    assert r.converged
    assert r.relative_residual_norm <= 1e-9


def test_cli_free_running_refined(tmp_path, capsys):
    import json

    from schwarz_tpu.cli import main

    rc = main([
        "--explicit_laplacian", "--set_1d_laplacian_size", "16",
        "--num_subdomains", "4", "--overlap", "2",
        "--free_running", "--set_tol", "1e-9",
        "--async_ninner", "20", "--async_chunk_rounds", "8",
    ])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    payload = json.loads(out)
    assert payload["converged"]
    assert payload["relative_residual_norm"] <= 1e-9


def test_free_running_rejects_unsupported_settings():
    # silent knob inertness is worse than an error: the free-running
    # dispatch must fail loudly on settings the kernels cannot honor
    from schwarz_tpu.exceptions import NotImplementedFeature
    from schwarz_tpu.ras import make_free_running_solver

    A = laplacian_2d(16)
    b = generate_rhs(A.n, random=False)
    base = dict(free_running=True, tolerance=1e-4, overlap=2)
    with pytest.raises(NotImplementedFeature):
        make_free_running_solver(
            A, b, 4, Settings(**base, accelerator="fgmres")
        )
    from schwarz_tpu.config import Precond

    with pytest.raises(NotImplementedFeature):
        make_free_running_solver(
            A, b, 4, Settings(**base, precond=Precond.block_jacobi)
        )
    # O-RAS is supported in-kernel now: the dispatch must build a boosted
    # solver, not raise
    s, _ = make_free_running_solver(
        A, b, 4, Settings(**base, oras_weight=-0.5)
    )
    assert s.oras_weight == -0.5
    assert s.plan.boost is not None
    # non-symmetric operators dispatch to the BiCGStab in-kernel solver
    s, _ = make_free_running_solver(
        A, b, 4, Settings(**base, non_symmetric_matrix=True)
    )
    assert s.nonsym


def test_two_level_async_coarse_restarts():
    # TWO-LEVEL asynchronous Schwarz: spectral coarse corrections applied
    # at the refinement restarts (host side, between kernel launches); the
    # barrier-free kernel only contracts the high-frequency remainder.
    # Must reach the same fixed point and spend fewer total kernel rounds
    # than the one-level refined run at the same target.
    from schwarz_tpu.ops.async_ras import AsyncRASolver

    A = laplacian_2d(48)
    b = generate_rhs(A.n, random=False)

    def make():
        return AsyncRASolver(A, b, num_subdomains=4, overlap=2,
                             tolerance=1e-2, staleness=1, ninner=16,
                             chunk_rounds=8)

    x1, i1 = make().run_refined(tol=1e-9, max_rounds=400)
    x2, i2 = make().run_refined(tol=1e-9, max_rounds=400, coarse_q=8)
    assert i2["converged"], i2
    assert i2["relative_residual_norm"] <= 1e-9
    x_ref = spla.spsolve(A.to_scipy().tocsc(), b)
    err = np.linalg.norm(x2 - x_ref) / np.linalg.norm(x_ref)
    assert err < 1e-7, err
    # the coarse corrections must shrink the kernel's share of the work
    assert i2["rounds"] < i1["rounds"], (i1["rounds"], i2["rounds"])


def test_two_level_async_through_solve():
    # two_level + free_running through the one-call API routes to the
    # coarse-restart refined driver instead of raising
    from schwarz_tpu import solve

    A = laplacian_2d(32)
    b = generate_rhs(A.n, random=False)
    r = solve(A, b, Settings(free_running=True, two_level=True,
                             coarse_aggregates=8, tolerance=1e-8,
                             max_iters=400, overlap=2),
              num_subdomains=4)
    assert r.converged
    assert r.relative_residual_norm <= 1e-8


def test_refined_general_ani3_to_1e8():
    # the reference's own anisotropic FEM test matrix through the TRUE
    # free-running mode to BASELINE's 1e-8 target: f32 kernel + f64
    # iterative-refinement restarts clear the conditioning floor that a
    # single f32 solve cannot (round-2 known-gap, now closed)
    from schwarz_tpu.models.mtx import matrix_path, read_mtx

    A = read_mtx(matrix_path("ani3_crop.mtx"))
    b = generate_rhs(A.n, random=False)
    part = make_partition(A, 4, Settings(partition=Partition.metis))
    s = AsyncGeneralRASolver(A, b, 4, overlap=2, tolerance=1e-4,
                             staleness=1, ninner=24, chunk_rounds=8,
                             part=part)
    x, info = s.run_refined(tol=1e-8, max_rounds=600)
    assert info["converged"], info
    assert info["relative_residual_norm"] <= 1e-8
    x_ref = spla.spsolve(A.to_scipy().tocsc(), b)
    err = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
    assert err < 1e-6, err
