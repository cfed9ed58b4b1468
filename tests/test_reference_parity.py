"""Residual-history parity against an independent numpy emulation of the
reference algorithm (tests/reference_emulator.py) — the BASELINE target
"iteration counts matching the reference algorithms (residual histories within
reference tolerance)"."""

import numpy as np
import pytest

from schwarz_tpu import LocalSolver, Partition, Settings, generate_rhs, laplacian_2d
from schwarz_tpu.core.decompose import decompose
from schwarz_tpu.ras import RASolver
from tests.reference_emulator import reference_ras


@pytest.mark.parametrize(
    "partition,S,overlap",
    [
        (Partition.regular, 2, 2),
        (Partition.regular, 4, 3),
        (Partition.regular, 4, 4),
        (Partition.metis, 4, 3),
        (Partition.regular2d, 4, 2),
    ],
)
def test_history_matches_reference_emulation(partition, S, overlap):
    A = laplacian_2d(12)
    b = generate_rhs(A.n)
    s = Settings(
        partition=partition, overlap=overlap, tolerance=1e-8,
        max_iters=300,
        # exact local solves to match the emulator's sparse LU
        local_solver=LocalSolver.direct_lu,
    )
    dec = decompose(A, b, s, S)
    ours = RASolver(dec).run()
    assert ours.converged

    closures = [
        dec.local_to_global[p, : dec.rows_count[p]] for p in range(S)
    ]
    # the emulator works in the permuted ordering (dec.global_matrix/global_rhs)
    x_ref_perm, lh, gh, it_ref = reference_ras(
        dec.global_matrix.to_scipy(), dec.global_rhs, dec.first_row,
        closures, 1e-8, 300,
    )
    x_ref = np.zeros_like(x_ref_perm)
    x_ref[dec.perm] = x_ref_perm
    # same detection iteration and matching residual histories
    assert ours.iters == it_ref
    n = min(len(gh), len(ours.global_resnorm_history))
    np.testing.assert_allclose(
        ours.global_resnorm_history[:n], gh[:n], rtol=1e-8, atol=1e-10
    )
    np.testing.assert_allclose(
        ours.local_resnorm_history[:n], lh[:n], rtol=1e-8, atol=1e-10
    )
    np.testing.assert_allclose(ours.solution, x_ref, rtol=1e-6, atol=1e-9)
