"""Halo exchange strategy tests: the neighbor (ppermute-round) strategy must be
bit-identical to the all_gather strategy, and stale-halo modes must still
converge (reference C9 enable_overlap / C10 one-sided semantics)."""

import numpy as np
import pytest

from schwarz_tpu import (
    CommSettings,
    HaloStrategy,
    Partition,
    Settings,
    generate_rhs,
    laplacian_2d,
    solve,
)
from schwarz_tpu.core.decompose import decompose
from schwarz_tpu.parallel.neighbor_exchange import build_neighbor_plan


def test_neighbor_plan_tables_consistent():
    A = laplacian_2d(16)
    b = generate_rhs(A.n)
    dec = decompose(A, b, Settings(overlap=3), 8)
    nx = build_neighbor_plan(dec, 4)  # 8 subdomains on 4 devices (Sl=2)
    S = 8
    R_ext = dec.meta.max_ext
    # emulate the rounds in numpy and check against direct halo_src gather
    rng = np.random.default_rng(0)
    D, Sl, R_int = 4, 2, dec.meta.max_interior
    x_own = rng.random((S, R_int))
    flat_global = x_own.reshape(-1)
    expect_full = flat_global[dec.halo_src]
    bufs = {}
    for k, r in enumerate(nx.offsets):
        for e in range(D):
            d = (e + r) % D
            sent = x_own[e * Sl:(e + 1) * Sl].reshape(-1)[nx.send_idx[k][e]]
            bufs[(d, k)] = sent
    n_rounds = len(nx.offsets)
    for p in range(S):
        d = p // Sl
        for j in range(dec.halo_slots.shape[1]):
            slot = dec.halo_slots[p, j]
            if slot == R_ext:       # padding entry
                assert nx.is_local[p, j]
                continue
            if nx.is_local[p, j]:
                assert nx.recv_round[p, j] == n_rounds
                got = x_own[d * Sl:(d + 1) * Sl].reshape(-1)[nx.local_src[p, j]]
            else:
                got = bufs[(d, nx.recv_round[p, j])][nx.recv_pos[p, j]]
            assert got == expect_full[p, slot], (p, j, slot)


@pytest.mark.parametrize(
    "partition", [Partition.regular, Partition.regular2d, Partition.metis]
)
def test_neighbor_strategy_matches_allgather(partition):
    A = laplacian_2d(16)
    b = generate_rhs(A.n)
    base = Settings(partition=partition, overlap=3, tolerance=1e-8, max_iters=200)
    r_ag = solve(A, b, base, num_subdomains=4)
    r_nx = solve(
        A, b,
        base.replace(comm=CommSettings(strategy=HaloStrategy.neighbor)),
        num_subdomains=4,
    )
    assert r_ag.converged and r_nx.converged
    assert r_ag.iters == r_nx.iters
    np.testing.assert_allclose(r_ag.solution, r_nx.solution, atol=1e-12)


def test_rdma_strategy_matches_allgather():
    # one-sided Pallas remote-DMA transport (interpreted on the CPU mesh);
    # must agree with the collective strategies exactly
    A = laplacian_2d(16)
    b = generate_rhs(A.n)
    base = Settings(overlap=3, tolerance=1e-8, max_iters=200)
    r_ag = solve(A, b, base, num_subdomains=4)
    r_rd = solve(
        A, b,
        base.replace(comm=CommSettings(strategy=HaloStrategy.rdma)),
        num_subdomains=4,
    )
    assert r_ag.converged and r_rd.converged
    assert r_ag.iters == r_rd.iters
    np.testing.assert_allclose(r_ag.solution, r_rd.solution, atol=1e-12)


def test_overlap_comm_stale_halo_converges():
    A = laplacian_2d(16)
    b = generate_rhs(A.n)
    s = Settings(
        overlap=3, tolerance=1e-6, max_iters=300,
        comm=CommSettings(overlap_comm=True),
    )
    r = solve(A, b, s, num_subdomains=4)
    assert r.converged
    assert r.relative_residual_norm < 1e-4
    # stale halos slow convergence but not catastrophically
    r_sync = solve(A, b, Settings(overlap=3, tolerance=1e-6, max_iters=300),
                   num_subdomains=4)
    assert r.iters >= r_sync.iters
    assert r.iters <= 4 * r_sync.iters + 10


def test_onesided_staleness_emulation():
    A = laplacian_2d(16)
    b = generate_rhs(A.n)
    s = Settings(
        overlap=3, tolerance=1e-6, max_iters=400,
        comm=CommSettings(onesided=True, staleness=3),
    )
    r = solve(A, b, s, num_subdomains=4)
    assert r.converged
    assert r.relative_residual_norm < 1e-4


@pytest.mark.parametrize("strategy", [HaloStrategy.all_gather,
                                      HaloStrategy.neighbor])
def test_multiple_subdomains_per_device(strategy):
    # Sl = S / D > 1: 8 subdomains on a 2-device mesh
    import jax

    from schwarz_tpu.core.decompose import decompose as _dec
    from schwarz_tpu.parallel.mesh import make_mesh
    from schwarz_tpu.ras import RASolver

    A = laplacian_2d(16)
    b = generate_rhs(A.n)
    s = Settings(overlap=3, tolerance=1e-8, max_iters=300,
                 comm=CommSettings(strategy=strategy))
    dec = _dec(A, b, s, 8)
    mesh = make_mesh(jax.devices()[:2])
    r = RASolver(dec, mesh=mesh).run()
    assert r.converged
    assert r.relative_residual_norm < 1e-6
    # must equal the one-subdomain-per-device result
    mesh8 = make_mesh(jax.devices()[:8])
    r8 = RASolver(_dec(A, b, s, 8), mesh=mesh8).run()
    assert r.iters == r8.iters
    np.testing.assert_allclose(r.solution, r8.solution, atol=1e-12)


def test_neighbor_rounds_are_few_for_regular_partition():
    A = laplacian_2d(16)
    b = generate_rhs(A.n)
    dec = decompose(A, b, Settings(overlap=2), 8)
    nx = build_neighbor_plan(dec, 8)
    # 1-D chain partition at one BFS ring: only +-1 device offsets carry data
    assert set(nx.offsets) <= {1, 7}
    # two rings reach +-2 but still far fewer than all D-1 offsets
    dec3 = decompose(A, b, Settings(overlap=3), 8)
    nx3 = build_neighbor_plan(dec3, 8)
    assert set(nx3.offsets) <= {1, 2, 6, 7}


@pytest.mark.parametrize("mode,one_by_one,flush", [
    ("put", False, "flush-all"),
    ("get", False, "flush-all"),
    ("put", True, "flush-all"),
    ("put", True, "flush-local"),
    ("get", True, "flush-local"),
])
def test_rdma_strategy_matrix(mode, one_by_one, flush):
    # the reference's one-sided strategy matrix (README.md:63-79): put/get x
    # gathered/one-by-one x flush discipline — all must agree exactly with
    # the all_gather exchange
    A = laplacian_2d(12)
    b = generate_rhs(A.n)
    base = Settings(overlap=2, tolerance=1e-8, max_iters=200)
    r_ag = solve(A, b, base, num_subdomains=4)
    r_rd = solve(
        A, b,
        base.replace(comm=CommSettings(
            strategy=HaloStrategy.rdma,
            enable_put=(mode == "put"), enable_get=(mode == "get"),
            enable_one_by_one=one_by_one, flush_type=flush,
        )),
        num_subdomains=4,
    )
    assert r_ag.converged and r_rd.converged
    assert r_ag.iters == r_rd.iters
    np.testing.assert_allclose(r_ag.solution, r_rd.solution, atol=1e-12)


def test_inert_knobs_fail_loudly():
    from schwarz_tpu.exceptions import NotImplementedFeature
    from schwarz_tpu.ras import RASolver

    A = laplacian_2d(8)
    b = generate_rhs(A.n)

    def build(comm):
        return RASolver(decompose(A, b, Settings(overlap=2, comm=comm), 2))

    with pytest.raises(NotImplementedFeature, match="stage_through_host"):
        build(CommSettings(stage_through_host=True))
    with pytest.raises(NotImplementedFeature, match="lock-all"):
        build(CommSettings(lock_type="lock-local"))
    with pytest.raises(ValueError, match="flush"):
        build(CommSettings(flush_type="bogus"))
    with pytest.raises(ValueError, match="enable_put"):
        build(CommSettings(enable_put=True, enable_get=True))
    with pytest.raises(NotImplementedFeature, match="shifted_iter"):
        RASolver(decompose(
            A, b, Settings(overlap=2, shifted_iter=True), 2))


def test_run_plan_fast_path_bit_identical():
    # the contiguous-run assembly must be bit-identical to the gather path
    # and must engage for regular partitions
    import jax

    from schwarz_tpu.core.decompose import decompose as _dec
    from schwarz_tpu.parallel.exchange import build_run_plan
    from schwarz_tpu.ras import RASolver

    A = laplacian_2d(20)
    b = generate_rhs(A.n)
    for overlap in (2, 4):
        s = Settings(overlap=overlap, tolerance=1e-8, max_iters=200)
        dec = _dec(A, b, s, 4)
        rp = build_run_plan(
            dec.halo_src_halo, dec.halo_slots, dec.meta.max_ext,
            dec.meta.max_interior, dec.interior_offset,
        )
        solver = RASolver(dec)
        if rp is None:
            continue
        assert solver._run_L is not None
        r_fast = solver.run()
        # force the gather path by clearing the run plan
        solver2 = RASolver(_dec(A, b, s, 4))
        solver2._run_L = None
        solver2._plan.pop("runs_src", None)
        solver2._plan.pop("runs_dst", None)
        solver2._run_fn = solver2._build_run_fn()
        r_slow = solver2.run()
        assert r_fast.iters == r_slow.iters
        np.testing.assert_array_equal(r_fast.solution, r_slow.solution)
    # at least one overlap must have engaged the fast path
    dec = _dec(A, b, Settings(overlap=2), 4)
    rp = build_run_plan(
        dec.halo_src_halo, dec.halo_slots, dec.meta.max_ext,
        dec.meta.max_interior, dec.interior_offset,
    )
    assert rp is not None, "regular-1D halos should decompose into runs"


def test_run_plan_falls_back_on_metis():
    from schwarz_tpu.core.decompose import decompose as _dec
    from schwarz_tpu.ras import RASolver

    A = laplacian_2d(16)
    b = generate_rhs(A.n)
    s = Settings(partition=Partition.metis, overlap=3, tolerance=1e-8,
                 max_iters=300)
    solver = RASolver(_dec(A, b, s, 4))
    # irregular halos: either a valid (safe) run plan or the gather path —
    # both must produce the same converged answer as all strategies do
    r = solver.run()
    assert r.converged


def test_runs_assembly_unrolled_matches_vmapped(monkeypatch):
    # the unrolled scalar-offset DUS form (TPU: true slice updates, no
    # scatter) must be bit-identical to the vmapped fallback
    import jax.numpy as jnp

    from schwarz_tpu.core.decompose import decompose as _dec
    from schwarz_tpu.parallel import exchange as ex

    A = laplacian_2d(20)
    b = generate_rhs(A.n)
    dec = _dec(A, b, Settings(overlap=3), 4)
    rp = ex.build_run_plan(
        dec.halo_src_halo, dec.halo_slots, dec.meta.max_ext,
        dec.meta.max_interior, dec.interior_offset,
    )
    assert rp is not None
    rng = np.random.default_rng(3)
    xo = jnp.asarray(
        rng.standard_normal((4, dec.meta.max_interior)), jnp.float32
    )
    args = (
        xo, xo.reshape(-1),
        jnp.asarray(dec.interior_offset.astype(np.int32)),
        rp.lengths,
        tuple(jnp.asarray(t) for t in rp.run_src),
        tuple(jnp.asarray(t) for t in rp.run_dst),
        dec.meta.max_ext, jnp.float32,
    )
    y_unrolled = ex.assemble_x_ext_runs(*args)
    monkeypatch.setattr(ex, "UNROLL_LIMIT", 0)   # force the vmapped form
    y_vmapped = ex.assemble_x_ext_runs(*args)
    np.testing.assert_array_equal(
        np.asarray(y_unrolled), np.asarray(y_vmapped)
    )
