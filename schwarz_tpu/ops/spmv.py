"""Sparse matrix-vector products in padded batched ELL format.

The device-side matrix format of this framework (replacing the reference's
per-rank ``gko::matrix::Csr`` SpMV, e.g. update_boundary's
``interface_matrix->apply`` restricted_schwarz.cpp:991-1017 and the local-residual
SpMV solve.cpp:833-835):

  ``vals[s, r, w]``, ``cols[s, r, w]`` — subdomain ``s``, row ``r``, ELL slot ``w``;
  padding slots carry value 0 with an in-range column index, so no masking is
  needed in the product itself.

ELL with a static width is the TPU-friendly sparse layout: the gather + multiply +
row-reduction vectorizes on the VPU with fully static shapes, and XLA fuses the
whole product into one kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ell_spmv(vals: jax.Array, cols: jax.Array, x: jax.Array) -> jax.Array:
    """y[r] = sum_w vals[r, w] * x[cols[r, w]] for one subdomain.

    ``x`` may be longer than the number of rows (extended/ghost index space).
    """
    return jnp.einsum("rw,rw->r", vals, x[cols])


def ell_spmv_batched(vals: jax.Array, cols: jax.Array, x: jax.Array) -> jax.Array:
    """Batched over the leading subdomain axis: (S, R, W) x (S, Rx) -> (S, R)."""
    return jax.vmap(ell_spmv)(vals, cols, x)


def ell_to_dense(vals: jax.Array, cols: jax.Array, n: int) -> jax.Array:
    """Densify one subdomain's ELL matrix into (n, n) (columns >= n dropped).

    Used to build dense factorizations for the direct local solvers — the
    TPU-native replacement for CHOLMOD/UMFPACK factorization (solve.cpp:92-173):
    dense factors run the triangular solves on the MXU instead of a
    level-scheduled sparse solve, which is hostile to wide SIMD.
    """
    R, W = vals.shape
    rows = jnp.broadcast_to(jnp.arange(R)[:, None], (R, W))
    in_range = (cols < n) & (rows < n)
    safe_cols = jnp.where(in_range, cols, 0)
    safe_rows = jnp.where(in_range, rows, 0)
    contrib = jnp.where(in_range, vals, 0.0)
    dense = jnp.zeros((n, n), dtype=vals.dtype)
    return dense.at[safe_rows.reshape(-1), safe_cols.reshape(-1)].add(
        contrib.reshape(-1)
    )
