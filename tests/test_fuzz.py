"""Light fuzz: random SPD sparse systems, random partitions — the true-residual
oracle must hold for every draw."""

import numpy as np
import pytest
import scipy.sparse as sp

from schwarz_tpu import Settings, solve
from schwarz_tpu.models import CSRMatrix


# whole-module slow tier: multi-minute free-running solves
pytestmark = pytest.mark.slow


def random_spd(n, density, rng):
    """Diagonally-dominant random symmetric matrix (SPD by construction)."""
    m = sp.random(n, n, density=density, random_state=rng, format="coo")
    m = (m + m.T) * 0.5
    m = m.tocsr()
    m.setdiag(np.abs(m).sum(axis=1).A1 + 1.0)
    return CSRMatrix.from_scipy(m.tocsr())


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_spd_systems(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(60, 200))
    A = random_spd(n, 0.05, np.random.RandomState(seed))
    b = rng.standard_normal(n)
    S = int(rng.choice([2, 3, 4]))
    overlap = int(rng.integers(2, 5))
    r = solve(A, b, Settings(overlap=overlap, tolerance=1e-8, max_iters=300),
              num_subdomains=S)
    assert r.converged, (n, S, overlap)
    x_ref = sp.linalg.spsolve(A.to_scipy().tocsc(), b)
    np.testing.assert_allclose(r.solution, x_ref, rtol=1e-5, atol=1e-7)


def test_random_partition_indices():
    # user-supplied (custom) partition: random assignment, still correct
    rng = np.random.default_rng(7)
    A = random_spd(120, 0.06, np.random.RandomState(7))
    b = rng.standard_normal(120)
    part = rng.integers(0, 4, 120).astype(np.int32)
    r = solve(A, b, Settings(overlap=3, tolerance=1e-8, max_iters=300),
              num_subdomains=4, partition_indices=part)
    assert r.converged
    x_ref = sp.linalg.spsolve(A.to_scipy().tocsc(), b)
    np.testing.assert_allclose(r.solution, x_ref, rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("seed", [3, 4, 5])
def test_random_systems_with_new_features(seed):
    """Random SPD draws through O-RAS / weighted partitioning / mixed
    precision: the true-residual oracle must hold for every combination."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(80, 180))
    A = random_spd(n, 0.05, np.random.RandomState(seed))
    b = rng.standard_normal(n)
    S = int(rng.choice([2, 4]))
    kw = {}
    s = Settings(
        overlap=int(rng.integers(2, 5)), tolerance=1e-8, max_iters=400,
        oras_weight=float(rng.uniform(-0.9, 0.0)),
    )
    if rng.random() < 0.5:
        kw["cell_weights"] = rng.uniform(0.5, 5.0, n)
    if rng.random() < 0.5:
        s = s.replace(local_compute_dtype="float32")
    r = solve(A, b, s, num_subdomains=S, **kw)
    assert r.converged, (n, S, s.oras_weight)
    x_ref = sp.linalg.spsolve(A.to_scipy().tocsc(), b)
    np.testing.assert_allclose(r.solution, x_ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("seed", [6, 7, 8, 9])
def test_random_systems_round2_features(seed):
    """Random draws through the round-2 knob surface: RDMA strategy matrix,
    neighbor-propagate norms, direct inverse apply, FGMRES chunking."""
    from schwarz_tpu import CommSettings, GlobalConvergence, HaloStrategy
    from schwarz_tpu.config import ConvergenceSettings, LocalSolver

    rng = np.random.default_rng(seed)
    n = int(rng.integers(80, 160))
    A = random_spd(n, 0.05, np.random.RandomState(seed))
    b = rng.standard_normal(n)
    S = int(rng.choice([2, 4]))
    strategy = HaloStrategy(
        rng.choice(["all_gather", "neighbor", "rdma"]))
    comm = CommSettings(
        strategy=strategy,
        enable_put=bool(rng.integers(2)),
        enable_get=False,
        enable_one_by_one=(
            bool(rng.integers(2)) if strategy == HaloStrategy.rdma else False
        ),
        flush_type=str(rng.choice(["flush-all", "flush-local"])),
    )
    comm = comm if comm.enable_put else CommSettings(
        strategy=comm.strategy, enable_put=False, enable_get=True,
        enable_one_by_one=comm.enable_one_by_one, flush_type=comm.flush_type,
    )
    from schwarz_tpu.config import Precond

    solver_kind = LocalSolver(rng.choice(["cg", "cholesky"]))
    s = Settings(
        overlap=int(rng.integers(2, 4)),
        tolerance=1e-8, max_iters=400,
        local_solver=solver_kind,
        precond=(
            Precond(rng.choice(["none", "jacobi", "fsai"]))
            if solver_kind == LocalSolver.iterative_cg else Precond.none
        ),
        direct_apply=(
            "inverse" if solver_kind == LocalSolver.direct_cholesky
            and rng.integers(2) else "trisolve"
        ),
        comm=comm,
        convergence=ConvergenceSettings(
            method=GlobalConvergence(
                rng.choice(["allgather", "decentralized"])),
            put_all_local_residual_norms=bool(rng.integers(2)),
        ),
        accelerator=str(rng.choice(["none", "fgmres"])),
    )
    r = solve(A, b, s, num_subdomains=S)
    assert r.converged, (seed, s)
    x_ref = sp.linalg.spsolve(A.to_scipy().tocsc(), b)
    np.testing.assert_allclose(r.solution, x_ref, rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("seed", [10, 11, 12])
def test_random_fem_systems_refined_async(seed):
    """Random draws through the late-round-2 surface: assembled FEM
    operators (Poisson / advection / elasticity) through the synchronous
    path, and random free-running refined solves on grid operators."""
    from schwarz_tpu.config import LocalSolver, Partition
    from schwarz_tpu.models import (
        fem_p1_advection,
        fem_p1_elasticity,
        fem_p1_poisson,
        generate_rhs,
        laplacian_2d,
    )

    rng = np.random.default_rng(seed)
    fam = rng.choice(["poisson", "advection", "elasticity"])
    n = int(rng.integers(8, 14))
    if fam == "poisson":
        A, b, _c, w = fem_p1_poisson(
            n, refine_levels=int(rng.integers(0, 3)),
            eps=float(rng.choice([1.0, 10.0])),
        )
        st = Settings(overlap=3, tolerance=1e-7, max_iters=500,
                      partition=Partition.metis)
    elif fam == "advection":
        A, b, _c, w = fem_p1_advection(
            n + 4, refine_cycles=int(rng.integers(0, 2)))
        st = Settings(overlap=3, tolerance=1e-7, max_iters=500,
                      partition=Partition.metis,
                      local_solver=LocalSolver.iterative_gmres,
                      non_symmetric_matrix=True)
    else:
        A, b, _c, w = fem_p1_elasticity(n)
        st = Settings(overlap=3, tolerance=1e-7, max_iters=500,
                      partition=Partition.metis)
    kw = {"cell_weights": w} if rng.random() < 0.5 else {}
    r = solve(A, b, st, num_subdomains=int(rng.choice([2, 4])), **kw)
    assert r.converged, fam
    x_ref = sp.linalg.spsolve(A.to_scipy().tocsc(), b)
    err = np.linalg.norm(r.solution - x_ref) / np.linalg.norm(x_ref)
    assert err < 1e-4, (fam, err)

    # free-running refined on a random grid operator (any kernel tier)
    gn = int(rng.choice([12, 16]))
    Ag = laplacian_2d(gn)
    bg = generate_rhs(Ag.n, random=False)
    sf = Settings(free_running=True, overlap=2, max_iters=400,
                  local_max_iters=20,
                  tolerance=float(rng.choice([1e-8, 1e-9])))
    rf = solve(Ag, bg, sf, num_subdomains=int(rng.choice([2, 4])))
    assert rf.converged
    assert rf.relative_residual_norm <= sf.tolerance


@pytest.mark.parametrize("seed", [13, 14, 15])
def test_random_systems_coarse_spaces(seed):
    """Random draws through the coarse-space surface: aggregates vs
    spectral x q x stationary/fgmres, plus a free-running two-level
    (coarse-restart) solve — the true-residual oracle must hold."""
    from schwarz_tpu.models import generate_rhs, laplacian_2d

    rng = np.random.default_rng(seed)
    A = laplacian_2d(int(rng.choice([24, 32, 40])))
    b = rng.standard_normal(A.n)
    S = int(rng.choice([2, 4]))
    s = Settings(
        overlap=int(rng.integers(2, 4)), tolerance=1e-8, max_iters=800,
        two_level=True,
        coarse_space=str(rng.choice(["aggregates", "spectral"])),
        coarse_aggregates=int(rng.choice([1, 2, 4, 8])),
        accelerator=str(rng.choice(["none", "fgmres"])),
    )
    r = solve(A, b, s, num_subdomains=S)
    assert r.converged, (seed, s)
    x_ref = sp.linalg.spsolve(A.to_scipy().tocsc(), b)
    np.testing.assert_allclose(r.solution, x_ref, rtol=1e-5, atol=1e-7)

    # two-level asynchronous Schwarz (spectral coarse at restarts)
    bg = generate_rhs(A.n, random=False)
    sf = Settings(free_running=True, two_level=True,
                  coarse_aggregates=int(rng.choice([2, 4, 8])),
                  overlap=2, max_iters=400, tolerance=1e-8)
    rf = solve(A, bg, sf, num_subdomains=S)
    assert rf.converged
    assert rf.relative_residual_norm <= sf.tolerance
