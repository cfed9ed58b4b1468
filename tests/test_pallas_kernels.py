"""Pallas kernel tests (interpret mode on the CPU mesh)."""

import numpy as np
import jax.numpy as jnp
import pytest

from schwarz_tpu import Settings, generate_rhs, laplacian_2d, solve
from schwarz_tpu.ops.pallas_kernels import (
    dia_spmv_pallas,
    dia_spmv_pallas2d,
    dia_spmv_pallas3,
    dia_spmv_supported,
)


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


@pytest.mark.parametrize("kern", [dia_spmv_pallas2d, dia_spmv_pallas3],
                         ids=["pallas2d", "pallas3"])
def test_dia_pallas_generations_match_shift_oracle(rng, kern):
    """pallas2d and pallas3 must agree with the reference shift
    accumulation to one f32 ulp (FMA contraction may differ)."""
    from schwarz_tpu.ops.dia import dia_spmv

    S, K, R = 2, 5, 512
    offsets = (-128, -1, 0, 1, 128)   # the 5-point stencil shape
    M = 128
    dia = rng.random((S, K, R)).astype(np.float32) - 0.5
    x = rng.random((S, R)).astype(np.float32) - 0.5
    xpad = jnp.asarray(np.pad(x, ((0, 0), (M, M))))
    y = np.asarray(kern(offsets, jnp.asarray(dia), xpad, interpret=True))
    yref = np.asarray(dia_spmv(offsets, jnp.asarray(dia), jnp.asarray(x)))
    np.testing.assert_allclose(y, yref, rtol=0, atol=2e-7)


def test_dia_pallas3_unaligned_margin(rng):
    """M not a multiple of 128: the kernel re-pads internally."""
    from schwarz_tpu.ops.dia import dia_spmv

    S, K, R = 2, 3, 256
    offsets = (-48, 0, 48)
    M = 48
    dia = rng.random((S, K, R)).astype(np.float32)
    x = rng.random((S, R)).astype(np.float32)
    xpad = jnp.asarray(np.pad(x, ((0, 0), (M, M))))
    y = np.asarray(
        dia_spmv_pallas3(offsets, jnp.asarray(dia), xpad, interpret=True))
    yref = np.asarray(dia_spmv(offsets, jnp.asarray(dia), jnp.asarray(x)))
    np.testing.assert_allclose(y, yref, rtol=1e-6)


def test_dia_ell_spmv_dispatches_pallas3(rng):
    """dia_ell_spmv(use_pallas=True) must route through pallas3 (the
    round-3 verdict's dead-code item) and match the XLA path bit-for-bit."""
    from schwarz_tpu.core.decompose import decompose
    from schwarz_tpu.ops.dia import dia_ell_spmv, split_dia_ell

    A = laplacian_2d(32)
    b = generate_rhs(A.n, random=False)
    dec = decompose(A, b, Settings(overlap=2, dtype="float32",
                                   row_pad_multiple=128), 4)
    hyb = split_dia_ell(dec.lmat_vals, dec.lmat_cols, dec.rows_count)
    x = jnp.asarray(
        rng.standard_normal((4, dec.meta.max_ext)).astype(np.float32))
    args = (hyb.offsets, jnp.asarray(hyb.dia_vals, jnp.float32),
            jnp.asarray(hyb.rem_rows), jnp.asarray(hyb.rem_vals, jnp.float32),
            jnp.asarray(hyb.rem_cols), x)
    y_xla = np.asarray(dia_ell_spmv(*args, use_pallas=False))
    y_p3 = np.asarray(dia_ell_spmv(*args, use_pallas=True,
                                   pallas_interpret=True, pallas_version=3))
    y_p2 = np.asarray(dia_ell_spmv(*args, use_pallas=True,
                                   pallas_interpret=True, pallas_version=2))
    scale = np.abs(y_xla).max()
    np.testing.assert_allclose(y_p3, y_xla, rtol=0, atol=2e-7 * scale)
    np.testing.assert_allclose(y_p2, y_xla, rtol=0, atol=2e-7 * scale)


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
