"""Global convergence protocol tests (reference C16-C19).

Each protocol must (a) detect convergence on every subdomain, (b) respect its
propagation latency (tree: one level per iteration), (c) never fire before
local convergence.
"""

import numpy as np
import pytest

from schwarz_tpu import (
    GlobalConvergence,
    Settings,
    generate_rhs,
    laplacian_2d,
    solve,
)
from schwarz_tpu.config import ConvergenceSettings


def _solve_with(method, S=4, accumulate=False, n=12, max_iters=300):
    A = laplacian_2d(n)
    b = generate_rhs(A.n)
    s = Settings(
        overlap=3,
        tolerance=1e-6,
        max_iters=max_iters,
        convergence=ConvergenceSettings(
            method=method, enable_accumulate=accumulate
        ),
    )
    return solve(A, b, s, num_subdomains=S)


@pytest.mark.parametrize(
    "method",
    [
        GlobalConvergence.allgather,
        GlobalConvergence.allreduce,
        GlobalConvergence.tree,
        GlobalConvergence.decentralized,
    ],
)
def test_all_protocols_converge(method):
    r = _solve_with(method)
    assert r.converged, f"{method} failed: iters={r.iters}"
    assert r.relative_residual_norm < 1e-4


def test_decentralized_accumulate_variant():
    r = _solve_with(GlobalConvergence.decentralized, accumulate=True)
    assert r.converged
    assert r.relative_residual_norm < 1e-4


def test_tree_latency_vs_allreduce():
    # the tree needs push-up + push-down rounds after local convergence, so it
    # detects no earlier than the counting protocols
    r_tree = _solve_with(GlobalConvergence.tree, S=8)
    r_red = _solve_with(GlobalConvergence.allreduce, S=8)
    assert r_tree.converged and r_red.converged
    assert r_tree.iters >= r_red.iters
    # ... but within O(2 log S) extra iterations
    assert r_tree.iters <= r_red.iters + 2 * int(np.ceil(np.log2(8))) + 2


def test_allreduce_waits_for_all_locals():
    # allreduce counts locally-converged subdomains; solution must satisfy the
    # global oracle when it fires
    r = _solve_with(GlobalConvergence.allreduce)
    assert r.converged
    assert r.relative_residual_norm < 1e-4


def test_protocols_agree_on_solution():
    sols = []
    for method in [GlobalConvergence.allgather, GlobalConvergence.tree]:
        r = _solve_with(method)
        assert r.converged
        sols.append(r.solution)
    # same fixed-point iteration, different detection: solutions close
    np.testing.assert_allclose(sols[0], sols[1], atol=1e-4)


def test_global_resnorm_is_current_not_min_so_far():
    # regression (ADVICE r1): every protocol must report the CURRENT summed
    # norm (so the divergence abort can fire on growth), not the
    # monotonically non-increasing min-so-far from res_table
    import jax
    import jax.numpy as jnp

    from schwarz_tpu.parallel.convergence import conv_step, init_conv_state
    from schwarz_tpu.parallel.mesh import SUBD_AXIS, make_mesh

    S = 8
    mesh = make_mesh(jax.devices())
    s = Settings(
        tolerance=1e-6,
        convergence=ConvergenceSettings(method=GlobalConvergence.decentralized),
    )

    def two_rounds(rn_a, rn_b):
        from jax.sharding import PartitionSpec as P

        def fn(rn1, rn2):
            st = init_conv_state(1, S, jnp.float64)
            rn0 = jnp.abs(rn1)
            lc = jnp.zeros(1, bool)
            adj = jnp.ones((1, S), bool)
            st, _, g1 = conv_step(s, S, st, rn1, rn0, lc, adj)
            st, _, g2 = conv_step(s, S, st, rn2, rn0, lc, adj)
            return g1, g2

        mapped = jax.jit(jax.shard_map(
            fn, mesh=mesh, in_specs=(P(SUBD_AXIS), P(SUBD_AXIS)),
            out_specs=(P(), P()), check_vma=False,
        ))
        return mapped(jnp.asarray(rn_a), jnp.asarray(rn_b))

    rn1 = np.full(S, 1.0)
    rn2 = np.full(S, 5.0)          # residual GREW
    g1, g2 = two_rounds(rn1, rn2)
    assert float(g1) == pytest.approx(S * 1.0)
    assert float(g2) == pytest.approx(S * 5.0)   # current, not min-so-far


def test_history_has_no_trailing_zero_row():
    # regression (ADVICE r1): histories are sliced to the populated prefix;
    # a trailing all-zero global-resnorm row could be misread as exact conv
    r = _solve_with(GlobalConvergence.allgather)
    assert r.converged
    assert len(r.global_resnorm_history) == r.iters + 1  # incl. detecting pass
    assert np.all(r.global_resnorm_history > 0)


def test_res_table_put_all_vs_neighbor_propagate():
    # C17: put-to-all shares every norm globally in one round
    # (conv_tools.hpp:55-82); neighbor-propagate moves information one
    # halo-graph edge per round (hpp:85-142)
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from schwarz_tpu.parallel.convergence import conv_step, init_conv_state
    from schwarz_tpu.parallel.mesh import SUBD_AXIS, make_mesh

    S = 8
    mesh = make_mesh(jax.devices())
    big = np.finfo(np.float64).max

    def run_rounds(put_all, n_rounds):
        s = Settings(
            tolerance=1e-6,
            convergence=ConvergenceSettings(
                method=GlobalConvergence.decentralized,
                put_all_local_residual_norms=put_all,
            ),
        )
        # 1-D chain adjacency: i receives from i-1 and i+1
        chain = np.zeros((S, S), bool)
        for i in range(S):
            for j in (i - 1, i + 1):
                if 0 <= j < S:
                    chain[i, j] = True

        def fn(rn, adj):
            st = init_conv_state(1, S, jnp.float64)
            for _ in range(n_rounds):
                st, _, _ = conv_step(
                    s, S, st, rn, jnp.abs(rn), jnp.zeros(1, bool), adj)
            return st.res_table

        mapped = jax.jit(jax.shard_map(
            fn, mesh=mesh, in_specs=(P(SUBD_AXIS), P(SUBD_AXIS)),
            out_specs=P(SUBD_AXIS), check_vma=False,
        ), static_argnums=())
        rn = jnp.arange(1, S + 1, dtype=jnp.float64)
        return np.asarray(mapped(rn, jnp.asarray(chain)))

    # put-to-all: after ONE round every table row is fully populated
    t1 = run_rounds(True, 1)
    assert np.all(t1 < big)

    # neighbor-propagate: after one round subdomain 0 knows itself + both
    # endpoints of its in-edges' tables; distant entries still unknown
    t2 = run_rounds(False, 1)
    assert t2[0, 0] == 1.0 and t2[0, 1] == 2.0
    assert t2[0, 5] == big          # 5 is 5 hops away — unknown after 1 round
    # after S rounds everything propagated down the chain
    t3 = run_rounds(False, S)
    assert np.all(t3 < big)


def test_neighbor_propagate_solver_converges():
    A = laplacian_2d(12)
    b = generate_rhs(A.n)
    s = Settings(
        overlap=3, tolerance=1e-6, max_iters=300,
        convergence=ConvergenceSettings(
            method=GlobalConvergence.decentralized,
            put_all_local_residual_norms=False,
        ),
    )
    r = solve(A, b, s, num_subdomains=8)
    assert r.converged
    assert r.relative_residual_norm < 1e-4
