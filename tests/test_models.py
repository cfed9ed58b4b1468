"""Unit tests for problem generators and matrix I/O (reference C4)."""

import numpy as np
import pytest

from schwarz_tpu.models import (
    CSRMatrix,
    advection_diffusion_2d,
    anisotropic_diffusion_2d,
    generate_rhs,
    laplacian_2d,
    read_mtx,
)

from schwarz_tpu.models import matrix_path

ANI3 = matrix_path("ani3_crop.mtx")


def test_laplacian_small_exact():
    # 2x2 grid: full 4x4 matrix known by hand
    A = laplacian_2d(2).to_scipy().toarray()
    expected = np.array(
        [
            [4, -1, -1, 0],
            [-1, 4, 0, -1],
            [-1, 0, 4, -1],
            [0, -1, -1, 4],
        ],
        dtype=float,
    )
    np.testing.assert_array_equal(A, expected)


def test_laplacian_structure():
    n = 8
    A = laplacian_2d(n)
    S = A.to_scipy()
    assert A.n == n * n
    # symmetric, diagonally dominant, no cross-row east/west couplings
    assert (S != S.T).nnz == 0
    d = S.diagonal()
    off = np.abs(S).sum(axis=1).A1 - np.abs(d)
    assert np.all(d >= off)  # weak diagonal dominance
    # row boundary: node n-1 (end of row 0) must not couple to node n east/west;
    # it does couple to n-1+n by the stencil
    row = S.getrow(n - 1)
    assert n not in row.indices or S[n - 1, n] == 0


def test_laplacian_spd():
    A = laplacian_2d(6).to_scipy().toarray()
    w = np.linalg.eigvalsh(A)
    assert w.min() > 0


def test_anisotropic_spd_and_symmetric():
    A = anisotropic_diffusion_2d(8, eps=50.0, theta=0.3).to_scipy()
    assert abs(A - A.T).max() < 1e-12
    w = np.linalg.eigvalsh(A.toarray())
    assert w.min() > -1e-10


def test_advection_nonsymmetric():
    A = advection_diffusion_2d(8).to_scipy()
    assert abs(A - A.T).max() > 1e-10


def test_laplacian_3d_structure():
    from schwarz_tpu.models import laplacian_3d

    A = laplacian_3d(4)
    S = A.to_scipy()
    assert A.n == 64
    assert (S != S.T).nnz == 0
    assert np.linalg.eigvalsh(S.toarray()).min() > 0
    # interior node has 7 entries
    assert S.getrow(21).nnz == 7


def test_helmholtz_indefinite_shift():
    from schwarz_tpu.models import helmholtz_2d, laplacian_2d

    A = helmholtz_2d(6, k=3.0)
    L = laplacian_2d(6)
    # same off-diagonals, shifted diagonal
    dA, dL = A.to_scipy().diagonal(), L.to_scipy().diagonal()
    assert np.allclose(dA, dL - dA[0] * 0 - (dL[0] - dA[0]))
    assert (dA < dL).all()


def test_generate_rhs_deterministic():
    a = generate_rhs(100)
    b = generate_rhs(100)
    np.testing.assert_array_equal(a, b)
    assert (a >= 0).all() and (a <= 1).all()
    assert np.all(generate_rhs(5, random=False) == 1.0)


def test_csr_from_coo_roundtrip(rng):
    import scipy.sparse as sp

    dense = rng.random((10, 10))
    dense[dense < 0.6] = 0.0
    S = sp.csr_matrix(dense)
    coo = S.tocoo()
    A = CSRMatrix.from_coo(coo.row, coo.col, coo.data, 10)
    np.testing.assert_allclose(A.to_scipy().toarray(), dense)


@pytest.mark.skipif(
    not __import__("os").path.exists(ANI3), reason="reference matrices not mounted"
)
def test_read_mtx_ani3():
    A = read_mtx(ANI3)
    assert A.n == 741
    S = A.to_scipy()
    # FEM matrix: symmetric
    assert abs(S - S.T).max() < 1e-10


def test_read_mtx_skew_symmetric(tmp_path):
    # regression: "skew-symmetric" matched the "symmetric" substring and
    # mirrored entries WITHOUT negation
    p = tmp_path / "skew.mtx"
    p.write_text(
        "%%MatrixMarket matrix coordinate real skew-symmetric\n"
        "3 3 2\n"
        "2 1 5.0\n"
        "3 2 -2.0\n"
    )
    from schwarz_tpu.models.mtx import read_mtx

    A = read_mtx(str(p)).to_scipy().toarray()
    assert A[1, 0] == 5.0 and A[0, 1] == -5.0
    assert A[2, 1] == -2.0 and A[1, 2] == 2.0


def test_vendored_matrices_match_reference():
    # the in-repo regenerated copies (matrices/) must read to the exact
    # float64 bits of the reference originals (matrices/ani3_crop.mtx:3)
    import os

    import numpy as np

    for name in ("ani3_crop.mtx", "ani4_crop.mtx"):
        ref = f"/root/reference/matrices/{name}"
        if not os.path.exists(ref):
            pytest.skip("reference checkout not mounted")
        A = read_mtx(matrix_path(name))
        B = read_mtx(ref)
        assert A.n == B.n
        assert np.array_equal(A.row_ptrs, B.row_ptrs)
        assert np.array_equal(A.col_idxs, B.col_idxs)
        assert np.array_equal(A.values, B.values)
