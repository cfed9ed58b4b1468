"""Factorize-once / solve-many: RASolver.set_rhs re-targets a built solver
at a new right-hand side with zero re-setup (the reference re-runs its whole
initialize() per system, schwarz_base.cpp:127-271)."""

import numpy as np
import pytest
import scipy.sparse.linalg as spla

from schwarz_tpu import Settings, generate_rhs, laplacian_2d
from schwarz_tpu.config import Partition, Precond
from schwarz_tpu.core.decompose import decompose
from schwarz_tpu.ras import RASolver


def _direct(A, b):
    return spla.spsolve(A.to_scipy().tocsc(), b)


def test_set_rhs_stationary_two_level():
    A = laplacian_2d(32)
    b1 = generate_rhs(A.n)
    rng = np.random.default_rng(7)
    b2 = rng.standard_normal(A.n)
    s = Settings(overlap=3, tolerance=1e-9, max_iters=400, two_level=True,
                 coarse_space="spectral", coarse_aggregates=4)
    solver = RASolver(decompose(A, b1, s, 4))
    r1 = solver.run()
    solver.set_rhs(b2)
    r2 = solver.run()
    assert r1.converged and r2.converged
    np.testing.assert_allclose(r1.solution, _direct(A, b1),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(r2.solution, _direct(A, b2),
                               rtol=1e-6, atol=1e-8)
    # and back: re-targeting is stateless w.r.t. the operator
    solver.set_rhs(b1)
    r3 = solver.run()
    np.testing.assert_allclose(r3.solution, r1.solution, rtol=1e-10)


@pytest.mark.slow
def test_set_rhs_fgmres_metis():
    # the accelerated path reads the decomposition's rhs per call; a
    # permuting (metis) partition must re-permute the new rhs correctly
    A = laplacian_2d(24)
    b1 = generate_rhs(A.n)
    b2 = np.sin(np.arange(A.n) * 0.1)
    s = Settings(overlap=3, tolerance=1e-9, max_iters=300,
                 partition=Partition.metis, precond=Precond.block_jacobi,
                 accelerator="fgmres")
    solver = RASolver(decompose(A, b1, s, 4))
    r1 = solver.run_accelerated()
    solver.set_rhs(b2)
    r2 = solver.run_accelerated()
    assert r1.converged and r2.converged
    np.testing.assert_allclose(r2.solution, _direct(A, b2),
                               rtol=1e-6, atol=1e-8)


def test_set_rhs_rejects_wrong_size():
    import pytest

    A = laplacian_2d(16)
    solver = RASolver(decompose(A, generate_rhs(A.n), Settings(), 4))
    with pytest.raises(ValueError, match="entries"):
        solver.set_rhs(np.ones(A.n + 1))
