"""P1 FEM assembly with adaptive refinement (models/fem_assembly.py) —
the dealii_ex_6 role: unstructured locally-refined operators feeding the
solver, where metis partitioning and cell_weights earn their keep."""

import numpy as np
import pytest
import scipy.sparse.linalg as spla

from schwarz_tpu import Settings, solve
from schwarz_tpu.config import Partition
from schwarz_tpu.models import fem_p1_poisson


def test_uniform_p1_matches_fd_laplacian():
    # on the uniform right-triangle mesh, P1 Poisson == the 5-point FD
    # stencil exactly (classical identity)
    A, rhs, coords, wt = fem_p1_poisson(8)
    from schwarz_tpu.models import laplacian_2d

    Afd = laplacian_2d(7)        # 7x7 interior nodes
    d = abs(A.to_scipy() - Afd.to_scipy()).max()
    assert d < 1e-12, d


def test_refined_mesh_is_conforming_and_spd():
    A, rhs, coords, wt = fem_p1_poisson(8, refine_levels=3, eps=50.0,
                                        theta=0.5)
    As = A.to_scipy()
    assert abs(As - As.T).max() < 1e-12
    w = np.linalg.eigvalsh(As.toarray())
    assert w.min() > 0
    # local refinement: node density concentrates near refine_at=(0,0)
    near = (np.linalg.norm(coords, axis=1) < 0.3).sum()
    far = (np.linalg.norm(coords - 1.0, axis=1) < 0.3).sum()
    assert near > 3 * far
    # refined nodes carry larger cell weights
    assert wt.max() > wt.min()


@pytest.mark.parametrize("partition", [Partition.metis, Partition.regular])
def test_ras_solves_refined_fem_system(partition):
    A, rhs, coords, wt = fem_p1_poisson(10, refine_levels=2, eps=10.0,
                                        theta=0.3)
    s = Settings(partition=partition, overlap=2, tolerance=1e-8,
                 max_iters=400, dtype="float64")
    r = solve(A, rhs, s, num_subdomains=4,
              cell_weights=wt if partition == Partition.metis else None)
    assert r.converged
    x_ref = spla.spsolve(A.to_scipy().tocsc(), rhs)
    np.testing.assert_allclose(r.solution, x_ref, rtol=1e-5, atol=1e-10)


def test_cell_weights_balance_refined_load():
    # weight-balanced metis partition: the weighted load per subdomain is
    # closer to uniform than the unweighted row-count split on a refined mesh
    from schwarz_tpu.core.partition import partition_metis

    A, rhs, coords, wt = fem_p1_poisson(12, refine_levels=3)
    S = 4
    pw = partition_metis(A, S, cell_weights=wt)
    loads_w = np.array([wt[pw == p].sum() for p in range(S)])
    imb_w = loads_w.max() / loads_w.mean()
    assert imb_w < 1.35, imb_w
