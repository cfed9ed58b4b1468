"""Weighted partition balancing (beyond the reference, whose METIS weight
pointer is null — partition_tools.hpp:185): parts balance cumulative row
weight, and weighted solves still converge to the true solution."""

import numpy as np
import pytest

from schwarz_tpu import Settings, generate_rhs, laplacian_2d, solve
from schwarz_tpu.config import Partition
from schwarz_tpu.core.decompose import decompose
from schwarz_tpu.core.partition import (
    make_partition,
    partition_metis,
    partition_regular_1d,
)


def _imbalance(part, w, nparts):
    loads = np.bincount(part, weights=w, minlength=nparts)
    return loads.max() / loads.mean()


def test_regular_1d_weighted_balances_weight():
    n, nparts = 1024, 8
    # front-loaded work: first quarter carries 10x the weight
    w = np.ones(n)
    w[: n // 4] = 10.0
    part = partition_regular_1d(n, nparts, w)
    # contiguous and complete
    assert np.all(np.diff(part) >= 0)
    assert part.min() == 0 and part.max() == nparts - 1
    assert _imbalance(part, w, nparts) < 1.10
    # unweighted splits by count -> heavily imbalanced by weight
    part_u = partition_regular_1d(n, nparts)
    assert _imbalance(part_u, w, nparts) > 2.0


def test_regular_1d_weighted_nonempty_extreme():
    # one row carries almost all weight: parts must still all be non-empty
    n, nparts = 64, 8
    w = np.ones(n)
    w[0] = 1e6
    part = partition_regular_1d(n, nparts, w)
    sizes = np.bincount(part, minlength=nparts)
    assert sizes.min() >= 1
    assert np.all(np.diff(part) >= 0)


def test_metis_weighted_balances_weight():
    A = laplacian_2d(48)
    n, nparts = A.n, 4
    rng = np.random.default_rng(0)
    # spatially-varying work: left half of the domain 8x heavier
    i = np.arange(n)
    w = np.where((i % 48) < 24, 8.0, 1.0) + rng.random(n)
    part = partition_metis(A, nparts, cell_weights=w)
    assert part.min() == 0 and part.max() == nparts - 1
    assert _imbalance(part, w, nparts) < 1.25
    # the weighted partition is never worse in weight balance than the
    # unweighted one (a hard ">1.5 for unweighted" negative control proved
    # fragile: a better cut can accidentally balance weight too)
    part_u = partition_metis(A, nparts)
    assert _imbalance(part, w, nparts) <= _imbalance(part_u, w, nparts) + 0.05


def test_metis_unweighted_unchanged_by_plumbing():
    A = laplacian_2d(32)
    p0 = partition_metis(A, 4)
    p1 = partition_metis(A, 4, cell_weights=None)
    np.testing.assert_array_equal(p0, p1)


def test_weighted_solve_converges():
    A = laplacian_2d(24)
    b = generate_rhs(A.n)
    w = np.ones(A.n)
    w[: A.n // 3] = 5.0
    for partition in [Partition.regular, Partition.metis]:
        r = solve(
            A, b,
            Settings(partition=partition, overlap=3, tolerance=1e-8,
                     max_iters=300),
            num_subdomains=4, cell_weights=w,
        )
        assert r.converged, partition
        x = np.asarray(r.solution)
        res = np.linalg.norm(A.to_scipy() @ x - np.asarray(b))
        assert res / np.linalg.norm(np.asarray(b)) < 1e-6


def test_weighted_decompose_block_sizes_follow_weights():
    A = laplacian_2d(32)
    b = generate_rhs(A.n)
    w = np.ones(A.n)
    w[: A.n // 4] = 10.0
    s = Settings(partition=Partition.regular, overlap=2)
    dec = decompose(A, b, s, 4, cell_weights=w)
    sizes = np.diff(dec.first_row)
    # the heavy quarter should be split across more parts -> first part small
    assert sizes[0] < sizes[-1]


def test_regular2d_rejects_weights():
    A = laplacian_2d(16)
    with pytest.raises(ValueError, match="cell_weights"):
        make_partition(
            A, 4, Settings(partition=Partition.regular2d),
            cell_weights=np.ones(A.n),
        )
