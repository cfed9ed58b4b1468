"""Decomposition invariants (reference C6: restricted_schwarz.cpp:55-304).

Oracle: for every subdomain, every interior+overlap row of the permuted global
matrix must be exactly reproduced by local-ELL + interface-ELL entries mapped
back to global column indices; the rhs restriction and halo plan must be
consistent with the permutation.
"""

import numpy as np
import pytest

from schwarz_tpu.config import Partition, Settings
from schwarz_tpu.core.decompose import decompose
from schwarz_tpu.models import anisotropic_diffusion_2d, generate_rhs, laplacian_2d


def reconstruct_row(dec, p, local_row):
    """Global (permuted) sparse row rebuilt from the split ELL matrices."""
    entries = {}
    for w in range(dec.meta.ell_width_local):
        v = dec.lmat_vals[p, local_row, w]
        if v != 0.0:
            gcol = dec.local_to_global[p, dec.lmat_cols[p, local_row, w]]
            entries[gcol] = entries.get(gcol, 0.0) + v
    for w in range(dec.meta.ell_width_interface):
        v = dec.imat_vals[p, local_row, w]
        if v != 0.0:
            gcol = dec.local_to_global[p, dec.imat_cols[p, local_row, w]]
            entries[gcol] = entries.get(gcol, 0.0) + v
    return entries


@pytest.mark.parametrize(
    "partition,S,overlap",
    [
        (Partition.regular, 2, 2),
        (Partition.regular, 4, 3),
        (Partition.regular2d, 4, 2),
        (Partition.metis, 3, 2),
    ],
)
def test_split_reproduces_global_rows(partition, S, overlap):
    A = laplacian_2d(8)
    b = generate_rhs(A.n)
    s = Settings(partition=partition, overlap=overlap)
    dec = decompose(A, b, s, S)
    Ap = dec.global_matrix

    for p in range(S):
        for lr in range(int(dec.rows_count[p])):
            grow = dec.local_to_global[p, lr]
            expect = {}
            for k in range(Ap.row_ptrs[grow], Ap.row_ptrs[grow + 1]):
                expect[Ap.col_idxs[k]] = Ap.values[k]
            got = reconstruct_row(dec, p, lr)
            assert set(got) == set(expect), (p, lr, grow)
            for c in expect:
                assert got[c] == pytest.approx(expect[c])


def test_permutation_bijective_and_consistent():
    A = anisotropic_diffusion_2d(8)
    b = generate_rhs(A.n)
    s = Settings(partition=Partition.metis, overlap=2)
    dec = decompose(A, b, s, 3)
    N = A.n
    # bijectivity (reference Utils validation, utils.cpp:127-152)
    assert sorted(dec.perm) == list(range(N))
    np.testing.assert_array_equal(dec.perm[dec.iperm], np.arange(N))
    # permuted matrix equals P A P^T
    S0 = A.to_scipy().toarray()
    Sp = dec.global_matrix.to_scipy().toarray()
    np.testing.assert_allclose(Sp, S0[np.ix_(dec.perm, dec.perm)])
    # rhs permuted with the matrix (our deliberate fix; ras.py module docstring)
    np.testing.assert_allclose(dec.global_rhs, b[dec.perm])


def test_interior_rows_are_contiguous_partition():
    # regular partitions use the sorted-closure ordering: the closure is the
    # global band restriction and the interior is a contiguous window at
    # interior_offset (zero DIA remainder; see decompose ordering note)
    A = laplacian_2d(8)
    b = generate_rhs(A.n)
    dec = decompose(A, b, Settings(partition=Partition.regular, overlap=2), 4)
    for p in range(4):
        lo, hi = dec.first_row[p], dec.first_row[p + 1]
        off = dec.interior_offset[p]
        np.testing.assert_array_equal(
            dec.local_to_global[p, off: off + hi - lo], np.arange(lo, hi)
        )
        assert dec.interior_count[p] == hi - lo
        rc = int(dec.rows_count[p])
        closure = dec.local_to_global[p, :rc]
        assert (np.diff(closure) > 0).all()  # sorted, unique


def test_overlap_grows_with_setting():
    A = laplacian_2d(12)
    b = generate_rhs(A.n)
    prev = None
    for ov in [2, 3, 4]:
        dec = decompose(A, b, Settings(overlap=ov), 4)
        tot = int(dec.rows_count.sum())
        if prev is not None:
            assert tot > prev  # each extra ring adds rows
        prev = tot
    # overlap rows of subdomain p are owned by other subdomains
    dec = decompose(A, b, Settings(overlap=2), 4)
    for p in range(4):
        slots = np.arange(dec.rows_count[p])
        off = dec.interior_offset[p]
        in_interior = (slots >= off) & (slots < off + dec.interior_count[p])
        ov_rows = dec.local_to_global[p, slots[~in_interior]]
        owners = np.searchsorted(dec.first_row, ov_rows, side="right") - 1
        assert (owners != p).all()


def test_halo_plan_gathers_correct_values():
    A = laplacian_2d(8)
    b = generate_rhs(A.n)
    dec = decompose(A, b, Settings(overlap=3), 4)
    meta = dec.meta
    # fabricate interior blocks with the permuted-global index as the value
    x_own = np.zeros((4, meta.max_interior))
    for p in range(4):
        n = int(dec.interior_count[p])
        x_own[p, :n] = np.arange(dec.first_row[p], dec.first_row[p + 1])
    flat = x_own.reshape(-1)
    for p in range(4):
        for slot in dec.valid_ext_slots(p):
            assert flat[dec.halo_src[p, slot]] == dec.local_to_global[p, slot]


def test_local_rhs_restriction():
    A = laplacian_2d(8)
    b = generate_rhs(A.n)
    dec = decompose(A, b, Settings(overlap=2), 4)
    for p in range(4):
        rc = int(dec.rows_count[p])
        np.testing.assert_allclose(
            dec.local_rhs[p, :rc], dec.global_rhs[dec.local_to_global[p, :rc]]
        )
        np.testing.assert_array_equal(dec.local_rhs[p, rc:], 0.0)


def test_comm_matrix_symmetric_structure():
    # for a structurally symmetric matrix, p needs q's data iff q needs p's
    A = laplacian_2d(10)
    b = generate_rhs(A.n)
    dec = decompose(A, b, Settings(overlap=2), 4)
    C = dec.comm_matrix
    assert (C.diagonal() == 0).all()
    assert ((C > 0) == (C > 0).T).all()


def test_padded_rows_identity():
    A = laplacian_2d(8)
    b = generate_rhs(A.n)
    dec = decompose(A, b, Settings(overlap=2), 4)
    for p in range(4):
        for r in range(int(dec.rows_count[p]), dec.meta.max_rows):
            assert dec.lmat_vals[p, r, 0] == 1.0
            assert dec.lmat_cols[p, r, 0] == r
            assert (dec.lmat_vals[p, r, 1:] == 0).all()


def test_single_subdomain_degenerate():
    A = laplacian_2d(6)
    b = generate_rhs(A.n)
    dec = decompose(A, b, Settings(overlap=2), 1)
    assert dec.meta.num_subdomains == 1
    assert dec.interior_count[0] == A.n
    assert dec.rows_count[0] == A.n
    assert dec.ghost_count[0] == 0
    assert (dec.imat_vals == 0).all()


def test_decompose_uneven_small_blocks():
    # regression: ceil blocks left subdomain 3 empty at N=9/S=4 and the
    # closure crashed with an opaque IndexError; balanced split instead
    import scipy.sparse as sp

    from schwarz_tpu.models import CSRMatrix

    n = 9
    M = sp.diags([np.ones(n - 1), 4 * np.ones(n), np.ones(n - 1)],
                 [-1, 0, 1]).tocsr()
    mat = CSRMatrix.from_scipy(M)
    dec = decompose(mat, np.ones(n), Settings(overlap=2), 4)
    assert (np.diff(dec.first_row) > 0).all()
