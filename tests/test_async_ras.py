"""Free-running asynchronous RAS kernel tests (ops/async_ras.py).

The reference's research core: ranks iterating at their own pace on
one-sided data (restricted_schwarz.cpp:714-852) with decentralized gossip
detection (conv_tools.hpp:212-275).  These tests run the multi-iteration
Pallas RDMA kernel under the interpreter on the 8-device CPU mesh and check

  - convergence to the SAME fixed point as a direct solve,
  - genuinely unequal per-device detection iterations (the asynchrony),
  - staleness-robustness (larger B still converges),
  - the fail-loudly gates for unsupported operators.
"""

import numpy as np
import pytest
import scipy.sparse.linalg as spla

from schwarz_tpu import generate_rhs, laplacian_2d
from schwarz_tpu.exceptions import NotImplementedFeature
from schwarz_tpu.ops.async_ras import AsyncRASolver, build_async_plan


@pytest.mark.slow
def test_async_converges_to_direct_solution():
    A = laplacian_2d(16)
    b = generate_rhs(A.n, random=False)
    solver = AsyncRASolver(A, b, num_subdomains=4, overlap=2,
                           tolerance=1e-5, staleness=1, ninner=20,
                           chunk_rounds=8)
    x, info = solver.run(max_rounds=200)
    assert info["converged"], info
    assert info["relative_residual_norm"] < 1e-4
    x_ref = spla.spsolve(A.to_scipy().tocsc(), b)
    err = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
    assert err < 1e-3, err


@pytest.mark.slow
def test_async_devices_detect_at_unequal_iterations():
    # the decentralized gossip needs graph-distance rounds to reach every
    # device: detection iterations MUST differ across devices
    A = laplacian_2d(16)
    b = generate_rhs(A.n, random=False)
    solver = AsyncRASolver(A, b, num_subdomains=8, overlap=2,
                           tolerance=1e-4, staleness=1, ninner=20,
                           chunk_rounds=8)
    x, info = solver.run(max_rounds=400)
    assert info["converged"], info
    done = info["done_at"]
    assert len(np.unique(done)) > 1, f"all devices detected at {done[0]}"


@pytest.mark.parametrize("D", [1, 2, 4])
@pytest.mark.slow
def test_async_subdomain_batching_converges(D):
    # Sl = S/D subdomains folded per device: same fixed point with fewer
    # devices than subdomains (D == 1 is the single-chip native shape)
    import jax

    from schwarz_tpu.parallel.mesh import make_mesh

    A = laplacian_2d(16)
    b = generate_rhs(A.n, random=False)
    solver = AsyncRASolver(A, b, num_subdomains=8, overlap=2,
                           tolerance=1e-5, staleness=1, ninner=20,
                           chunk_rounds=8,
                           mesh=make_mesh(jax.devices()[:D]))
    assert solver.Sl == 8 // D
    x, info = solver.run(max_rounds=300)
    assert info["converged"], info
    assert info["relative_residual_norm"] < 1e-4
    assert len(info["done_at"]) == D
    x_ref = spla.spsolve(A.to_scipy().tocsc(), b)
    err = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
    assert err < 1e-3, err


def test_async_batching_rejects_non_divisible():
    import jax

    from schwarz_tpu.parallel.mesh import make_mesh

    A = laplacian_2d(16)
    b = generate_rhs(A.n, random=False)
    with pytest.raises(ValueError, match="multiple"):
        AsyncRASolver(A, b, num_subdomains=8, overlap=2,
                      mesh=make_mesh(jax.devices()[:3]))


@pytest.mark.parametrize("staleness", [1, 2, 3])
@pytest.mark.slow
def test_async_bounded_staleness_converges(staleness):
    A = laplacian_2d(16)
    b = generate_rhs(A.n, random=False)
    solver = AsyncRASolver(A, b, num_subdomains=4, overlap=2,
                           tolerance=1e-4, staleness=staleness, ninner=20,
                           chunk_rounds=10)
    x, info = solver.run(max_rounds=300)
    assert info["converged"], info
    assert info["relative_residual_norm"] < 1e-3


@pytest.mark.slow
def test_async_fresh_read_converges_and_never_slower():
    """fresh_read peeks the newer slots' DMA semaphores and consumes the
    freshest fully-arrived message: the fixed point is unchanged, and at
    staleness 3 the effective staleness can only shrink, so detection
    must not get slower (arrival timing is scheduler-dependent under the
    interpreter, so only the one-sided bound is asserted)."""
    A = laplacian_2d(16)
    b = generate_rhs(A.n, random=False)

    def run(fresh):
        s = AsyncRASolver(A, b, num_subdomains=4, overlap=2,
                          tolerance=1e-5, staleness=3, ninner=20,
                          chunk_rounds=10, fresh_read=fresh)
        x, info = s.run(max_rounds=300)
        assert info["converged"], info
        x_ref = spla.spsolve(A.to_scipy().tocsc(), b)
        err = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
        assert err < 1e-3, err
        if fresh:
            assert info["fresh_read_hits"] > 0, info
        else:
            assert info["fresh_read_hits"] == 0, info
        return int(np.max(info["done_at"]))

    assert run(True) <= run(False)


@pytest.mark.slow
def test_async_more_staleness_never_faster():
    A = laplacian_2d(16)
    b = generate_rhs(A.n, random=False)

    def iters(stale):
        s = AsyncRASolver(A, b, num_subdomains=4, overlap=2,
                          tolerance=1e-5, staleness=stale, ninner=20,
                          chunk_rounds=10)
        _, info = s.run(max_rounds=300)
        assert info["converged"]
        return int(np.max(info["done_at"]))

    assert iters(3) >= iters(1)


@pytest.mark.slow
def test_async_oras_fewer_rounds_same_fixed_point():
    # O-RAS Robin transmission in the kernel (preconditioner form): the
    # correction CG runs on A_dom + c*D_drop while the residual keeps the
    # true A.  Measured 384 -> 128 rounds at 64^2/8; here a smaller grid
    # with a comparative assertion (heuristic margins are fragile).
    A = laplacian_2d(32)
    b = generate_rhs(A.n, random=False)
    x_ref = spla.spsolve(A.to_scipy().tocsc(), b)

    def run(c):
        s = AsyncRASolver(A, b, num_subdomains=8, overlap=2,
                          tolerance=1e-4, staleness=1, ninner=10,
                          chunk_rounds=8, oras_weight=c)
        x, info = s.run(max_rounds=400)
        assert info["converged"], (c, info)
        err = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
        assert err < 1e-2, (c, err)
        return int(np.max(info["done_at"]))

    assert run(-0.8) < run(0.0)


@pytest.mark.slow
def test_async_nonsym_bicgstab_converges():
    # non-symmetric advection-diffusion through the free-running kernel:
    # the in-kernel correction solver switches to Jacobi-BiCGStab (the
    # asynchronous counterpart of the reference's GMRES local branch,
    # solve.cpp:486-570); fixed point = the direct solution
    from schwarz_tpu.models.fem import advection_diffusion_2d

    A = advection_diffusion_2d(32)
    b = generate_rhs(A.n, random=False)
    s = AsyncRASolver(A, b, num_subdomains=8, overlap=2, tolerance=1e-4,
                      staleness=1, ninner=10, chunk_rounds=8, nonsym=True)
    x, info = s.run(max_rounds=400)
    assert info["converged"], info
    x_ref = spla.spsolve(A.to_scipy().tocsc(), b)
    err = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
    assert err < 1e-3, err


@pytest.mark.slow
def test_async_nonsym_gmres_converges():
    # in-kernel GMRES(m) correction (nonsym_solver='gmres'): the reference's
    # non-symmetric local branch (solve.cpp:486-570) in free-running form
    from schwarz_tpu.models.fem import advection_diffusion_2d

    A = advection_diffusion_2d(32)
    b = generate_rhs(A.n, random=False)
    s = AsyncRASolver(A, b, num_subdomains=8, overlap=2, tolerance=1e-4,
                      staleness=1, ninner=10, chunk_rounds=8, nonsym=True,
                      nonsym_solver="gmres")
    x, info = s.run(max_rounds=400)
    assert info["converged"], info
    x_ref = spla.spsolve(A.to_scipy().tocsc(), b)
    err = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
    assert err < 1e-3, err


@pytest.mark.slow
def test_async_gmres_succeeds_where_bicgstab_diverges():
    # skew-dominant operator (central differences at Pe=2000): the
    # short-recurrence BiCGStab correction diverges while the
    # optimal-in-the-Krylov-space GMRES(m) converges — the case class the
    # reference reserves its GMRES branch for (solve.cpp:486-570)
    from schwarz_tpu.models.fem import advection_diffusion_2d

    A = advection_diffusion_2d(32, peclet=2000.0, bx=1.0, by=0.3,
                               upwind=False)
    b = generate_rhs(A.n, random=False)
    x_ref = spla.spsolve(A.to_scipy().tocsc(), b)

    s_g = AsyncRASolver(A, b, num_subdomains=8, overlap=2, tolerance=1e-4,
                        staleness=1, ninner=10, chunk_rounds=8, nonsym=True,
                        nonsym_solver="gmres")
    x, ginfo = s_g.run(max_rounds=240)
    assert ginfo["converged"], ginfo
    err = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
    assert err < 1e-3, err

    s_b = AsyncRASolver(A, b, num_subdomains=8, overlap=2, tolerance=1e-4,
                        staleness=1, ninner=10, chunk_rounds=8, nonsym=True,
                        nonsym_solver="bicgstab")
    _, binfo = s_b.run(max_rounds=240)
    assert not binfo["converged"]


def test_async_rejects_unknown_nonsym_solver():
    A = laplacian_2d(16)
    b = generate_rhs(A.n, random=False)
    with pytest.raises(ValueError, match="nonsym_solver"):
        AsyncRASolver(A, b, num_subdomains=4, nonsym=True,
                      nonsym_solver="idr")


@pytest.mark.slow
def test_solve_api_free_running_nonsym():
    # one-call API: free_running + non_symmetric dispatches to BiCGStab
    from schwarz_tpu import CommSettings, Settings, solve
    from schwarz_tpu.models.fem import advection_diffusion_2d

    A = advection_diffusion_2d(16)
    b = generate_rhs(A.n, random=False)
    s = Settings(overlap=2, tolerance=1e-4, max_iters=400,
                 free_running=True, non_symmetric_matrix=True,
                 local_max_iters=10, comm=CommSettings(staleness=1))
    r = solve(A, b, s, num_subdomains=4)
    assert r.converged
    x_ref = spla.spsolve(A.to_scipy().tocsc(), b)
    err = np.linalg.norm(r.solution - x_ref) / np.linalg.norm(x_ref)
    assert err < 1e-2, err


def test_async_oras_rejects_out_of_range_weights():
    A = laplacian_2d(16)
    b = generate_rhs(A.n, random=False)
    with pytest.raises(ValueError, match="outside"):
        build_async_plan(A, b, 4, 2, oras_weight=-1.5)
    # a sign-flipped weight stiffens the solve operator the wrong way —
    # reject rather than silently degrade
    with pytest.raises(ValueError, match="outside"):
        build_async_plan(A, b, 4, 2, oras_weight=0.8)


def test_async_oras_boost_values():
    # interface rows get c * sum|dropped couplings|; interior rows none;
    # physical-boundary rows none (A has no entries beyond the grid)
    A = laplacian_2d(16)
    b = generate_rhs(A.n, random=False)
    c = -0.5
    p = build_async_plan(A, b, 4, 2, oras_weight=c)
    assert p.boost is not None
    for d in range(p.S):
        lo = d * p.R - p.hw
        dom = p.mask_dom[d] > 0
        # recompute dropped-coupling sums directly from the DIA data
        exp = np.zeros(p.total)
        for k, off in enumerate(p.offsets):
            if off == 0:
                continue
            j = np.arange(p.total) + off
            ok = (j >= 0) & (j < p.total)
            tgt = np.zeros(p.total, dtype=bool)
            tgt[ok] = dom[j[ok]]
            drop = dom & ~tgt
            exp[drop] += np.abs(p.dia[d, k, drop])
        np.testing.assert_allclose(p.boost[d], c * exp, rtol=1e-6)
        # boosted Jacobi diagonal
        k0 = p.offsets.index(0)
        dg = p.dia[d, k0] + p.boost[d]
        nz = np.abs(dg) > 0
        np.testing.assert_allclose(p.dinv[d][nz], 1.0 / dg[nz], rtol=1e-6)
    # interior-only rows (away from any window edge) are unboosted
    mid = p.hw + p.R // 2
    assert p.boost[1][mid] == 0.0


def test_async_plan_gates_fail_loudly():
    # unstructured (too many diagonals) must raise, not silently degrade
    rng = np.random.default_rng(0)
    n = 64
    import scipy.sparse as sp

    rows = np.repeat(np.arange(n), 3)
    cols = rng.integers(0, n, size=3 * n)
    vals = rng.standard_normal(3 * n)
    m = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    m = m + sp.eye(n) * 10
    from schwarz_tpu.models import CSRMatrix

    mat = CSRMatrix.from_scipy(m)
    with pytest.raises(NotImplementedFeature, match="banded"):
        build_async_plan(mat, np.ones(n), 4, 2)


def test_async_plan_masks_and_operator():
    # plan invariants: interior masks tile the true rows; the extended DIA
    # rows reproduce A exactly on the solve domain
    A = laplacian_2d(12)
    b = generate_rhs(A.n, random=False)
    p = build_async_plan(A, b, 4, 2)
    total = np.zeros(p.S * p.R)
    for d in range(p.S):
        total[d * p.R:(d + 1) * p.R] += p.mask_int[d][p.hw:p.hw + p.R]
    assert np.all(total[:p.N] == 1.0)
    # residual of the exact solution is ~0 on every device's domain
    x_ref = spla.spsolve(A.to_scipy().tocsc(), b)
    xg = np.zeros(p.S * p.R)
    xg[:p.N] = x_ref
    for d in range(p.S):
        lo = d * p.R - p.hw
        xp = np.zeros(p.total)
        g0, g1 = max(lo, 0), min(lo + p.total, p.S * p.R)
        xp[g0 - lo:g1 - lo] = xg[g0:g1]
        y = np.zeros(p.total)
        for k, off in enumerate(p.offsets):
            idx = np.arange(p.total) + off
            ok = (idx >= 0) & (idx < p.total)
            y[ok] += p.dia[d, k, ok] * xp[idx[ok]]
        r = p.mask_dom[d] * (p.b[d] - y)
        assert np.linalg.norm(r) < 1e-3, (d, np.linalg.norm(r))


@pytest.mark.slow
def test_solve_api_free_running():
    # the one-call library API dispatches to the free-running kernel
    from schwarz_tpu import CommSettings, Settings, solve

    A = laplacian_2d(16)
    b = generate_rhs(A.n, random=False)
    s = Settings(overlap=2, tolerance=1e-5, max_iters=200, free_running=True,
                 local_max_iters=20, comm=CommSettings(staleness=1))
    r = solve(A, b, s, num_subdomains=4)
    assert r.converged
    assert r.relative_residual_norm < 1e-4
    x_ref = spla.spsolve(A.to_scipy().tocsc(), b)
    err = np.linalg.norm(r.solution - x_ref) / np.linalg.norm(x_ref)
    assert err < 1e-3


@pytest.mark.slow
def test_async_checkpoint_resume(tmp_path):
    A = laplacian_2d(16)
    b = generate_rhs(A.n, random=False)
    solver = AsyncRASolver(A, b, num_subdomains=4, overlap=2,
                           tolerance=1e-5, staleness=1, ninner=20,
                           chunk_rounds=6)
    # full run for reference
    x_full, info_full = solver.run(max_rounds=300)
    assert info_full["converged"]
    # capped run + checkpoint, then resume to completion
    ck = str(tmp_path / "async.npz")
    x_cap, info_cap = solver.run(max_rounds=6, checkpoint_path=ck)
    assert not info_cap["converged"]
    state = solver.load_checkpoint(ck)
    x_res, info_res = solver.run(max_rounds=300, resume_state=state)
    assert info_res["converged"]
    np.testing.assert_allclose(x_res, x_full, atol=1e-5)
    assert info_full["comm_bytes_per_device"] > 0


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_async_random_banded_refined(seed):
    # random banded SPD matrices with ASYMMETRIC offset sets through the
    # free-running kernel + refinement restarts: exercises the BFS-level
    # overlap geometry (ovp = overlap * bandwidth) on irregular bands —
    # the degenerate-overlap regression surface (fixed 2026-08-18)
    import scipy.sparse as sp

    from schwarz_tpu.models import CSRMatrix

    rng = np.random.default_rng(seed)
    n = int(rng.integers(200, 500))
    offs = sorted(set([0] + list(
        rng.integers(-12, 13, size=int(rng.integers(2, 6))).tolist()
    )))
    rows, cols, vals = [], [], []
    for o in offs:
        i = np.arange(max(0, -o), min(n, n - o))
        rows.append(i)
        cols.append(i + o)
        vals.append(rng.uniform(0.1, 1.0, i.size) * (-1 if o else 1))
    M = sp.coo_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(n, n),
    ).tocsr()
    M = 0.5 * (M + M.T)
    M = M + sp.diags(np.abs(M).sum(axis=1).A1 + 0.5)
    A = CSRMatrix.from_scipy(M.tocsr())
    b = rng.standard_normal(n)
    s = AsyncRASolver(A, b, num_subdomains=int(rng.choice([2, 4])),
                      overlap=int(rng.integers(1, 4)), tolerance=1e-3,
                      staleness=1, ninner=10, chunk_rounds=8,
                      oras_weight=float(rng.choice([0.0, -0.6])))
    x, info = s.run_refined(tol=1e-8, max_rounds=400)
    assert info["converged"], (seed, info)
    x_ref = spla.spsolve(M.tocsc(), b)
    err = np.abs(x - x_ref).max() / np.abs(x_ref).max()
    assert err < 1e-6, (seed, err)
