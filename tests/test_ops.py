"""Device ops unit tests (reference C23 gather/scatter, and the ELL SpMV that
replaces Ginkgo's CSR apply)."""

import jax.numpy as jnp
import numpy as np
import pytest

from schwarz_tpu.config import Settings
from schwarz_tpu.core.decompose import decompose
from schwarz_tpu.models import generate_rhs, laplacian_2d
from schwarz_tpu.ops import (
    GatherOp,
    ell_spmv_batched,
    ell_to_dense,
    gather_values,
    scatter_values,
)


def test_ell_spmv_matches_scipy():
    A = laplacian_2d(8)
    b = generate_rhs(A.n)
    dec = decompose(A, b, Settings(overlap=3), 4)
    rng = np.random.default_rng(0)
    x_ext = np.zeros((4, dec.meta.max_ext))
    # populate only valid slots, like the exchange does
    for p in range(4):
        slots = dec.valid_ext_slots(p)
        x_ext[p, slots] = rng.random(slots.size)
    y = np.asarray(
        ell_spmv_batched(
            jnp.asarray(dec.lmat_vals), jnp.asarray(dec.lmat_cols),
            jnp.asarray(x_ext[:, : dec.meta.max_rows]),
        )
    )
    Ap = dec.global_matrix.to_scipy()
    for p in range(4):
        rc = int(dec.rows_count[p])
        l2g = dec.local_to_global[p]
        # local ELL covers only closure columns: compare against restriction
        rows = l2g[:rc]
        sub = Ap[rows][:, rows]
        expect = sub @ x_ext[p, :rc]
        np.testing.assert_allclose(y[p, :rc], expect, atol=1e-12)


def test_ell_to_dense():
    vals = jnp.array([[[2.0, 1.0], [0.0, 3.0], [5.0, 0.0]]])
    cols = jnp.array([[[0, 2], [1, 1], [2, 0]]])
    d = ell_to_dense(vals[0], cols[0], 3)
    expect = np.array([[2, 0, 1], [0, 3, 0], [0, 0, 5]], dtype=float)
    np.testing.assert_allclose(np.asarray(d), expect)


@pytest.mark.parametrize("op", list(GatherOp))
def test_gather_ops(op):
    frm = jnp.arange(10.0)
    idx = jnp.array([3, 1, 4])
    into = jnp.array([10.0, 20.0, 30.0])
    out = np.asarray(gather_values(None, idx, frm, into, op))
    vals = np.array([3.0, 1.0, 4.0])
    base = np.array([10.0, 20.0, 30.0])
    expect = {
        GatherOp.copy: vals,
        GatherOp.add: base + vals,
        GatherOp.diff: base - vals,
        GatherOp.avg: (base + vals) / 2,
    }[op]
    np.testing.assert_allclose(out, expect)


@pytest.mark.parametrize("op", list(GatherOp))
def test_scatter_ops(op):
    frm = jnp.array([1.0, 2.0, 3.0])
    idx = jnp.array([4, 0, 2])
    into = jnp.full(5, 10.0)
    out = np.asarray(scatter_values(None, idx, frm, into, op))
    expect = np.full(5, 10.0)
    if op == GatherOp.copy:
        expect[[4, 0, 2]] = [1, 2, 3]
    elif op == GatherOp.add:
        expect[[4, 0, 2]] = [11, 12, 13]
    elif op == GatherOp.diff:
        expect[[4, 0, 2]] = [9, 8, 7]
    else:
        expect[[4, 0, 2]] = [5.5, 6.0, 6.5]
    np.testing.assert_allclose(out, expect)


def test_gather_masked_num():
    frm = jnp.arange(10.0)
    idx = jnp.array([3, 1, 4])
    into = jnp.array([10.0, 20.0, 30.0])
    out = np.asarray(gather_values(2, idx, frm, into, GatherOp.copy))
    np.testing.assert_allclose(out, [3.0, 1.0, 30.0])


def test_f64_split_roundtrip_error_below_pair_precision():
    # ops/f64_split: on CPU (native f64) the two-float split captures ~48
    # mantissa bits — the recombination must sit within the EMULATED-f64
    # pair precision the TPU path relies on (where it is exact)
    import numpy as np

    from schwarz_tpu.ops.f64_split import split_f64

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(4096) * 10.0**rng.integers(
        -6, 6, 4096), jnp.float64)
    hi, lo = split_f64(x)
    back = hi.astype(jnp.float64) + lo.astype(jnp.float64)
    rel = np.abs(np.asarray(back - x)) / np.maximum(np.abs(np.asarray(x)),
                                                    1e-300)
    assert rel.max() < 2.0**-45
