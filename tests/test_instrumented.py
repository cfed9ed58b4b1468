"""run_instrumented (C29): the five-stage measurement mode must converge to
the same answer as the fused loop and report all five reference stages
(schwarz_base.cpp:393-450)."""

import numpy as np
import pytest

from schwarz_tpu import Settings, generate_rhs, laplacian_2d
from schwarz_tpu.core.decompose import decompose
from schwarz_tpu.ras import RASolver

STAGES = [
    "boundary_exchange", "boundary_update", "convergence_check",
    "local_solve", "expand_local_vec",
]


@pytest.mark.parametrize("oras", [0.0, -0.5])
def test_instrumented_matches_fused_loop(oras):
    A = laplacian_2d(20)
    b = generate_rhs(A.n)
    s = Settings(overlap=3, tolerance=1e-6, max_iters=200, oras_weight=oras)
    dec = decompose(A, b, s, 4)
    solver = RASolver(dec)
    r_fused = solver.run()
    r_inst = solver.run_instrumented()
    assert r_inst.converged and r_fused.converged
    assert r_inst.iters == r_fused.iters
    np.testing.assert_allclose(
        r_inst.solution, r_fused.solution, rtol=1e-10, atol=1e-12
    )
    assert r_inst.stage_timings is not None
    for st in STAGES:
        assert st in r_inst.stage_timings, st
        assert r_inst.stage_timings[st]["total"] > 0


def test_instrumented_neighbor_two_level():
    # round-1 verdict: per-stage attribution must cover the production
    # configs (neighbor exchange + two_level), not only all_gather/one-level
    from schwarz_tpu import CommSettings, HaloStrategy

    A = laplacian_2d(24)
    b = generate_rhs(A.n)
    s = Settings(overlap=3, tolerance=1e-6, max_iters=150, two_level=True,
                 comm=CommSettings(strategy=HaloStrategy.neighbor))
    solver = RASolver(decompose(A, b, s, 4))
    r = solver.run_instrumented()
    assert r.converged
    keys = set(r.stage_timings)
    assert {"boundary_exchange", "boundary_update", "convergence_check",
            "local_solve", "expand_local_vec", "coarse_correction",
            "residual_recompute"} <= keys
    # instrumented must agree with the fused loop on the iterate
    r_fused = solver.run()
    assert abs(r.iters - r_fused.iters) <= 1
    np.testing.assert_allclose(
        r.solution, r_fused.solution, rtol=1e-8, atol=1e-10)


def test_instrumented_raises_on_stale_modes():
    from schwarz_tpu import CommSettings

    A = laplacian_2d(12)
    b = generate_rhs(A.n)
    s = Settings(overlap=2, comm=CommSettings(overlap_comm=True))
    solver = RASolver(decompose(A, b, s, 2))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="fresh halos"):
        solver.run_instrumented()


def test_instrumented_matches_fused_mixed_precision():
    # regression: instrumented mode missed the mixed-precision correction-
    # form condition and the reset_local_crit_iter schedule, so it timed a
    # DIFFERENT algorithm than run() for the same flags
    from schwarz_tpu import generate_rhs, laplacian_2d
    from schwarz_tpu.core.decompose import decompose
    from schwarz_tpu.ras import RASolver

    A = laplacian_2d(16)
    b = generate_rhs(A.n, random=False)
    s = Settings(overlap=3, tolerance=1e-8, max_iters=300, dtype="float64",
                 local_compute_dtype="float32", local_max_iters=10,
                 reset_local_crit_iter=3)
    solver = RASolver(decompose(A, b, s, 4))
    r_fused = solver.run()
    r_inst = solver.run_instrumented()
    assert r_fused.converged and r_inst.converged
    assert r_inst.iters == r_fused.iters, (r_inst.iters, r_fused.iters)
    np.testing.assert_allclose(r_inst.solution, r_fused.solution,
                               rtol=1e-10, atol=1e-12)
