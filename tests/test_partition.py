"""Partitioner unit tests (reference C5)."""

import numpy as np
import pytest

from schwarz_tpu.config import Partition, Settings
from schwarz_tpu.core.partition import (
    make_partition,
    partition_metis,
    partition_regular_1d,
    partition_regular_2d,
)
from schwarz_tpu.models import laplacian_2d


def test_regular_1d_blocks():
    p = partition_regular_1d(10, 3)
    # nb = ceil(10/3) = 4 -> blocks 4,4,2 (restricted_schwarz.cpp:98-102)
    np.testing.assert_array_equal(p, [0, 0, 0, 0, 1, 1, 1, 1, 2, 2])


def test_regular_1d_covers_all():
    for n, s in [(100, 7), (16, 16), (5, 2)]:
        p = partition_regular_1d(n, s)
        assert p.min() >= 0 and p.max() < s
        # contiguous nondecreasing
        assert (np.diff(p) >= 0).all()


def test_regular_2d_grid():
    p = partition_regular_2d(16, 4)  # 4x4 grid, 2x2 parts
    grid = p.reshape(4, 4)
    np.testing.assert_array_equal(grid[:2, :2], 0)
    np.testing.assert_array_equal(grid[:2, 2:], 1)
    np.testing.assert_array_equal(grid[2:, :2], 2)
    np.testing.assert_array_equal(grid[2:, 2:], 3)


def test_regular_2d_rejects_bad_sizes():
    with pytest.raises(ValueError):
        partition_regular_2d(15, 4)
    with pytest.raises(ValueError):
        partition_regular_2d(16, 3)


@pytest.mark.parametrize("nparts", [2, 3, 4, 8])
def test_metis_equiv_balance_and_cover(nparts):
    A = laplacian_2d(16)
    p = partition_metis(A, nparts)
    assert p.shape == (A.n,)
    sizes = np.bincount(p, minlength=nparts)
    assert sizes.min() > 0
    # balance within 10%
    assert sizes.max() <= int(np.ceil(A.n / nparts * 1.10))


def test_metis_equiv_cut_quality():
    # a sane graph partitioner should beat a random partition's edge cut easily
    A = laplacian_2d(16)
    S = A.to_scipy()
    p = partition_metis(A, 4)
    coo = S.tocoo()
    cut = int((p[coo.row] != p[coo.col]).sum())
    rng = np.random.default_rng(0)
    prand = rng.integers(0, 4, A.n)
    cut_rand = int((prand[coo.row] != prand[coo.col]).sum())
    assert cut < cut_rand / 4


def test_make_partition_dispatch():
    A = laplacian_2d(8)
    s = Settings(partition=Partition.regular)
    assert make_partition(A, 4, s).max() == 3
    s = Settings(partition=Partition.regular2d)
    assert make_partition(A, 4, s).max() == 3
    s = Settings(partition=Partition.metis)
    assert make_partition(A, 4, s).max() == 3
    assert make_partition(A, 1, s).max() == 0
