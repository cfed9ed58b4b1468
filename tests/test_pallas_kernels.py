"""Pallas kernel tests (interpret mode on the CPU mesh)."""

import numpy as np
import jax.numpy as jnp
import pytest

from schwarz_tpu import Settings, generate_rhs, laplacian_2d, solve
from schwarz_tpu.ops.pallas_kernels import dia_spmv_pallas, dia_spmv_supported


def test_dia_pallas_matches_oracle(rng):
    S, K, R, M = 3, 5, 256, 16
    offsets = (-16, -1, 0, 1, 16)
    dia = rng.random((S, K, R)).astype(np.float32)
    x = rng.random((S, R)).astype(np.float32)
    xpad = np.pad(x, ((0, 0), (M, M)))
    y = np.asarray(
        dia_spmv_pallas(offsets, jnp.asarray(dia), jnp.asarray(xpad),
                        interpret=True)
    )
    yref = np.zeros((S, R), np.float32)
    for k, off in enumerate(offsets):
        yref += dia[:, k, :] * xpad[:, M + off: M + off + R]
    np.testing.assert_allclose(y, yref, rtol=1e-6)


def test_dia_pallas_support_predicate():
    assert dia_spmv_supported(2048, np.float32)
    assert not dia_spmv_supported(100, np.float32)   # not 128-divisible
    assert not dia_spmv_supported(2048, np.float64)  # f64 -> XLA path


def test_solve_with_forced_pallas_matches_default():
    # full RAS solve with the Pallas kernel (interpreted) vs the XLA path
    A = laplacian_2d(16)
    b = generate_rhs(A.n)
    # f32 compute: 1e-5 relative reduction is attainable, 1e-8 is not
    base = Settings(overlap=3, tolerance=1e-5, max_iters=200, dtype="float32",
                    local_tolerance=1e-6, spmv_format="dia",
                    row_pad_multiple=128)
    r_pallas = solve(A, b, base.replace(use_pallas="on"), num_subdomains=4)
    r_xla = solve(A, b, base.replace(use_pallas="off"), num_subdomains=4)
    assert r_pallas.converged and r_xla.converged
    assert abs(r_pallas.iters - r_xla.iters) <= 1
    np.testing.assert_allclose(
        r_pallas.solution, r_xla.solution, rtol=1e-4, atol=1e-5
    )
