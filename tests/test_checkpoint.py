"""Checkpoint/resume of the solver state (SURVEY.md §5: the reference has none —
its state is the iterate + iteration counter; here it is a first-class
capability)."""

import numpy as np

from schwarz_tpu import Settings, generate_rhs, laplacian_2d
from schwarz_tpu.core.decompose import decompose
from schwarz_tpu.ras import RASolver


def test_checkpoint_resume_equals_uninterrupted(tmp_path):
    A = laplacian_2d(12)
    b = generate_rhs(A.n)
    # uninterrupted run
    s_full = Settings(overlap=3, tolerance=1e-10, max_iters=200)
    dec = decompose(A, b, s_full, 4)
    full = RASolver(dec).run()
    assert full.converged

    # run 5 iterations, checkpoint, resume with a fresh solver
    s_short = s_full.replace(max_iters=5)
    short_solver = RASolver(decompose(A, b, s_short, 4))
    ckpt = str(tmp_path / "state.npz")
    partial = short_solver.run(checkpoint_path=ckpt)
    assert not partial.converged and partial.iters == 5

    resume_solver = RASolver(decompose(A, b, s_full, 4))
    st = resume_solver.load_checkpoint(ckpt)
    resumed = resume_solver.run(resume_state=st)
    assert resumed.converged
    # resumed total iterations = full iterations (same fixed-point sequence)
    assert int(st["it"]) + resumed.iters - 5 <= full.iters + 1
    np.testing.assert_allclose(resumed.solution, full.solution, atol=1e-8)


def test_chunked_run_identical(tmp_path):
    # chunked execution (watchdog-bounded XLA executions) must be bit-identical
    A = laplacian_2d(12)
    b = generate_rhs(A.n)
    s = Settings(overlap=3, tolerance=1e-8, max_iters=200)
    solver = RASolver(decompose(A, b, s, 4))
    full = solver.run()
    chunked = solver.run(chunk_iters=7)
    assert chunked.converged == full.converged
    assert chunked.iters == full.iters
    np.testing.assert_array_equal(chunked.solution, full.solution)


def test_checkpoint_roundtrip_identity(tmp_path):
    A = laplacian_2d(8)
    b = generate_rhs(A.n)
    solver = RASolver(decompose(A, b, Settings(overlap=2, max_iters=3), 2))
    r = solver.run(checkpoint_path=str(tmp_path / "s.npz"))
    st = solver.load_checkpoint(str(tmp_path / "s.npz"))
    assert int(st["it"]) == 3
    assert st["x_own"].shape == (2, solver.meta.max_interior)
