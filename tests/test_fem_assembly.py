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


# --- dealii_ex_9 role: SUPG advection -------------------------------------

def test_advection_exact_for_linear_solution():
    # constant beta, linear u: SUPG + weak inflow reproduce u EXACTLY
    # (edge-midpoint quadrature is exact through degree 2)
    from schwarz_tpu.models import fem_p1_advection

    def beta(p):
        out = np.zeros_like(p)
        out[:, 0] = 1.0
        out[:, 1] = 0.5
        return out

    def u_exact(p):
        return 1.0 + 2.0 * p[:, 0] + 3.0 * p[:, 1]

    def source(p):
        return np.full(len(p), 1.0 * 2.0 + 0.5 * 3.0)   # beta . grad u

    A, rhs, coords, _wt = fem_p1_advection(
        8, beta=beta, source=source, inflow_values=u_exact
    )
    u = spla.spsolve(A.to_scipy().tocsc(), rhs)
    np.testing.assert_allclose(u, u_exact(coords), rtol=0, atol=1e-10)


def test_advection_operator_shape_and_asymmetry():
    from schwarz_tpu.models import fem_p1_advection

    A, rhs, coords, wt = fem_p1_advection(12)
    V = len(coords)
    assert A.n == V == len(rhs) == len(wt)
    S = A.to_scipy()
    asym = abs(S - S.T).max() / abs(S).max()
    assert asym > 0.1, "SUPG advection operator must be non-symmetric"
    assert np.isfinite(S.data).all()


def test_advection_gradient_refinement_concentrates_cells():
    # the gradient-estimator cycles must refine where |grad u| is largest
    # and keep the mesh conforming (solvable system at each level)
    from schwarz_tpu.models import fem_p1_advection

    A0, _, c0, _ = fem_p1_advection(10, refine_cycles=0)
    A2, _, c2, w2 = fem_p1_advection(10, refine_cycles=2)
    assert A2.n > A0.n
    # refined vertices carry higher incident-cell weight somewhere
    assert w2.max() > 6  # structured mesh has at most 6 incident cells


def test_ras_solves_advection_fem_system():
    from schwarz_tpu.config import LocalSolver
    from schwarz_tpu.models import fem_p1_advection

    A, rhs, _c, _w = fem_p1_advection(16, refine_cycles=1)
    st = Settings(
        tolerance=1e-7, max_iters=600, overlap=3,
        partition=Partition.metis,
        local_solver=LocalSolver.iterative_gmres,
        non_symmetric_matrix=True,
    )
    r = solve(A, rhs, st, num_subdomains=4)
    assert r.converged, r
    assert r.relative_residual_norm < 1e-6
    x_ref = spla.spsolve(A.to_scipy().tocsc(), rhs)
    err = np.linalg.norm(r.solution - x_ref) / np.linalg.norm(x_ref)
    assert err < 1e-5, err


# --- dealii_ex_17 role: vector-P1 elasticity --------------------------------

def _naive_elasticity(n, lam=1.0, mu=1.0):
    """Independent loop-based assembly of the step-8 bilinear form (the
    test oracle for the vectorized production code)."""
    from schwarz_tpu.models.fem_assembly import _structured_triangulation

    verts, tris = _structured_triangulation(n)
    verts = -1.0 + 2.0 * verts
    V = len(verts)
    A = np.zeros((2 * V, 2 * V))
    for t in tris:
        P = verts[list(t)]
        e = P[[2, 0, 1]] - P[[1, 2, 0]]
        twoA = e[0, 0] * e[1, 1] - e[0, 1] * e[1, 0]
        area = abs(twoA) / 2.0
        g = np.stack([-e[:, 1], e[:, 0]], axis=-1) / twoA
        for a in range(3):
            for b in range(3):
                for ci in range(2):
                    for cj in range(2):
                        v = lam * g[a, ci] * g[b, cj] \
                            + mu * g[a, cj] * g[b, ci] \
                            + (mu * g[a] @ g[b] if ci == cj else 0.0)
                        A[2 * t[a] + ci, 2 * t[b] + cj] += area * v
    on_bnd = (np.abs(np.abs(verts) - 1.0) < 1e-12).any(axis=1)
    keep = ~np.repeat(on_bnd, 2)
    return A[np.ix_(keep, keep)]


def test_elasticity_matches_naive_assembly():
    from schwarz_tpu.models import fem_p1_elasticity

    A, _rhs, _c, _w = fem_p1_elasticity(4)
    ref = _naive_elasticity(4)
    np.testing.assert_allclose(A.to_scipy().toarray(), ref, atol=1e-12)


def test_elasticity_spd():
    from schwarz_tpu.models import fem_p1_elasticity

    A, rhs, coords, wt = fem_p1_elasticity(8)
    S = A.to_scipy()
    assert abs(S - S.T).max() < 1e-12
    w = np.linalg.eigvalsh(S.toarray())
    assert w.min() > 0, w.min()
    assert A.n == len(rhs) == len(coords) == len(wt)


def test_elasticity_manufactured_solution_converges():
    # u1 = u2 = sin(pi x) sin(pi y):  f = pi^2 (2 mu w + (lam+mu)(w - c))
    # in both components, with w = sin sin and c = cos cos; nodal error
    # must shrink ~O(h^2)
    from schwarz_tpu.models import fem_p1_elasticity

    def force(p):
        w = np.sin(np.pi * p[:, 0]) * np.sin(np.pi * p[:, 1])
        c = np.cos(np.pi * p[:, 0]) * np.cos(np.pi * p[:, 1])
        f1 = np.pi ** 2 * (2.0 * w + 2.0 * (w - c))
        return np.stack([f1, f1], axis=1)

    errs = []
    for n in (8, 16):
        A, rhs, coords, _ = fem_p1_elasticity(n, body_force=force)
        u = spla.spsolve(A.to_scipy().tocsc(), rhs)
        w = np.sin(np.pi * coords[:, 0]) * np.sin(np.pi * coords[:, 1])
        errs.append(np.max(np.abs(u - w)))
    assert errs[1] < 0.35 * errs[0], errs


def test_ras_solves_elasticity_system():
    from schwarz_tpu.models import fem_p1_elasticity

    A, rhs, _c, wt = fem_p1_elasticity(12)
    st = Settings(tolerance=1e-7, max_iters=600, overlap=3,
                  partition=Partition.metis)
    r = solve(A, rhs, st, num_subdomains=4, cell_weights=wt)
    assert r.converged, r
    assert r.relative_residual_norm < 1e-6
    x_ref = spla.spsolve(A.to_scipy().tocsc(), rhs)
    err = np.linalg.norm(r.solution - x_ref) / np.linalg.norm(x_ref)
    assert err < 1e-5, err
