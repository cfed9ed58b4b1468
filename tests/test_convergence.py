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
