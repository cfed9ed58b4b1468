"""Local preconditioners: Jacobi and block-Jacobi.

Reference: optional block-Jacobi / ParILU / ISAI preconditioners on the local
iterative solver (solve.cpp:490-556, 575-648, flag ``use_precond``
settings.hpp:181).  The TPU menu is diagonal Jacobi and batched dense
block-Jacobi: diagonal blocks are extracted from the ELL operator at setup,
inverted with batched dense inverses, and applied as a block-diagonal matmul —
an MXU-shaped operation (Ginkgo's adaptive-precision block-Jacobi is likewise a
batched small-dense-block apply on GPU).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from schwarz_tpu.config import Precond, Settings


def extract_diagonal(vals: jax.Array, cols: jax.Array) -> jax.Array:
    """diag[s, r] = A_s[r, r] from ELL (columns unique within a row)."""
    R = vals.shape[1]
    r = jnp.arange(R)[None, :, None]
    return jnp.sum(jnp.where(cols == r, vals, 0.0), axis=-1)


def extract_diag_blocks(vals: jax.Array, cols: jax.Array, bs: int) -> jax.Array:
    """Dense diagonal blocks (S, R//bs, bs, bs) of the batched ELL operator."""
    S, R, W = vals.shape
    assert R % bs == 0, f"block size {bs} must divide padded rows {R}"
    rows = jnp.broadcast_to(jnp.arange(R)[None, :, None], (S, R, W))
    same_block = (cols // bs) == (rows // bs)
    blk = rows // bs
    ri = rows % bs
    ci = cols % bs
    out = jnp.zeros((S, R // bs, bs, bs), dtype=vals.dtype)
    s_idx = jnp.broadcast_to(jnp.arange(S)[:, None, None], (S, R, W))
    contrib = jnp.where(same_block, vals, 0.0)
    safe_ci = jnp.where(same_block, ci, ri)  # diagonal slot for masked entries
    return out.at[
        s_idx.reshape(-1), blk.reshape(-1), ri.reshape(-1), safe_ci.reshape(-1)
    ].add(jnp.where(same_block, contrib, 0.0).reshape(-1))


def make_preconditioner(
    settings: Settings, vals: jax.Array, cols: jax.Array
) -> Optional[Callable[[jax.Array], jax.Array]]:
    """Build the apply-function ``z = M^{-1} r`` (batched (S, R) -> (S, R))."""
    if settings.precond == Precond.none:
        return None
    if settings.precond == Precond.jacobi:
        d = extract_diagonal(vals, cols)
        dinv = jnp.where(jnp.abs(d) > 0, 1.0 / d, 1.0)

        def apply_jacobi(r):
            return dinv * r

        return apply_jacobi
    if settings.precond == Precond.block_jacobi:
        bs = settings.block_jacobi_block_size
        blocks = extract_diag_blocks(vals, cols, bs)
        # guard singular padded blocks with an identity shift on exact-zero rows
        eye = jnp.eye(bs, dtype=vals.dtype)
        row_absent = jnp.all(blocks == 0.0, axis=-1, keepdims=True)
        blocks = blocks + row_absent * eye
        inv_blocks = jnp.linalg.inv(blocks)

        def apply_block_jacobi(r):
            S, R = r.shape
            rb = r.reshape(S, R // bs, bs)
            zb = jnp.einsum("sbij,sbj->sbi", inv_blocks, rb)
            return zb.reshape(S, R)

        return apply_block_jacobi
    raise ValueError(f"unknown preconditioner {settings.precond}")
