"""DIA(+ELL-remainder) sparse operator — the TPU-native SpMV formulation.

Motivation (measured on TPU v5e): XLA lowers the gather in a plain ELL SpMV
(``x[cols]``) to scalar-unit loads — ~60 ms for a 5.5M-nnz operator, i.e.
~90 Mnnz/s, two orders of magnitude under the HBM roofline.  Matrices from
FD/FEM discretizations are *banded*: almost all entries sit on a handful of
``col - row`` diagonals.  Storing those as dense diagonals turns the SpMV into
static shifts + multiply-adds — pure VPU work with zero gathers:

    y[r] = sum_k dia_vals[k, r] * x[r + off_k]   +   (tiny ELL remainder)

The remainder (entries off the chosen diagonals: overlap-row couplings,
unstructured FEM entries) stays in ELL; for stencil problems it is only a few
percent of the nnz, so the scalar-gather cost becomes negligible.  For fully
unstructured matrices the format degrades gracefully to pure ELL.

This plays the role of Ginkgo's SpMV-format choice in the reference (the
reference uses CSR on GPU; the TPU-native answer is shift-based DIA).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class DiaEllMatrices:
    """Batched hybrid operator for all subdomains of a decomposition (host).

    The remainder is *row-compacted*: only rows that actually carry off-diagonal
    remainder entries appear (padded with the scratch row index ``R_rows``), so
    the per-iteration gather volume is O(remainder), not O(rows).
    """

    offsets: Tuple[int, ...]        # shared diagonal offsets (static)
    dia_vals: np.ndarray            # (S, K, R_rows)
    rem_rows: np.ndarray            # (S, Or) int32 row index; R_rows = scratch
    rem_vals: np.ndarray            # (S, Or, Wr) ELL remainder
    rem_cols: np.ndarray            # (S, Or, Wr)
    n_rows: int                     # R_rows
    max_abs_offset: int


def split_dia_ell(
    ell_vals: np.ndarray,           # (S, R_rows, W)
    ell_cols: np.ndarray,           # (S, R_rows, W)
    rows_count: np.ndarray,         # (S,)
    max_diags: int = 16,
    min_fill: float = 0.02,
) -> DiaEllMatrices:
    """Extract the dominant diagonals of a batched ELL matrix.

    An offset qualifies if its entries cover at least ``min_fill`` of the total
    nonzeros (across the whole batch); at most ``max_diags`` offsets are kept.
    Chosen-entry positions move to the dense diagonals, everything else stays in
    a re-packed (narrower) ELL remainder.  Padded rows' identity diagonals live
    on offset 0, which always qualifies for FD/FEM matrices.
    """
    S, R, W = ell_vals.shape
    rows = np.arange(R, dtype=np.int64)[None, :, None]
    nz = ell_vals != 0.0
    delta = ell_cols.astype(np.int64) - rows

    # histogram of col-row offsets over true nonzeros
    deltas_nz = delta[nz]
    total = max(deltas_nz.size, 1)
    uniq, counts = np.unique(deltas_nz, return_counts=True)
    order = np.argsort(-counts)
    chosen = []
    for i in order[:max_diags]:
        if counts[i] >= min_fill * total:
            chosen.append(int(uniq[i]))
    chosen = tuple(sorted(chosen))
    K = len(chosen)

    dia_vals = np.zeros((S, max(K, 1), R), dtype=ell_vals.dtype)
    off_to_k = {off: k for k, off in enumerate(chosen)}

    on_dia = np.zeros_like(nz)
    for off, k in off_to_k.items():
        sel = nz & (delta == off)
        # rows can hold at most one entry per diagonal (unique columns per row)
        s_idx, r_idx, w_idx = np.nonzero(sel)
        dia_vals[s_idx, k, r_idx] = ell_vals[s_idx, r_idx, w_idx]
        on_dia |= sel

    rem = nz & ~on_dia
    rem_per_row = rem.sum(axis=2)                    # (S, R)
    Wr = max(int(rem_per_row.max()) if rem_per_row.size else 0, 1)
    rows_with_rem = rem_per_row > 0
    Or = max(int(rows_with_rem.sum(axis=1).max()), 1)
    rem_rows = np.full((S, Or), R, dtype=np.int32)   # scratch row = R
    rem_cols = np.zeros((S, Or, Wr), dtype=np.int32)
    rem_vals = np.zeros((S, Or, Wr), dtype=ell_vals.dtype)
    for s in range(S):
        rws = np.nonzero(rows_with_rem[s])[0]
        rem_rows[s, : rws.size] = rws.astype(np.int32)
        for j, r in enumerate(rws):
            w_idx = np.nonzero(rem[s, r])[0]
            rem_cols[s, j, : w_idx.size] = ell_cols[s, r, w_idx]
            rem_vals[s, j, : w_idx.size] = ell_vals[s, r, w_idx]

    return DiaEllMatrices(
        offsets=chosen,
        dia_vals=dia_vals,
        rem_rows=rem_rows,
        rem_vals=rem_vals,
        rem_cols=rem_cols,
        n_rows=R,
        max_abs_offset=max((abs(o) for o in chosen), default=0),
    )


def dia_ell_spmv(
    offsets: Tuple[int, ...],
    dia_vals: jax.Array,            # (S, K, R)
    rem_rows: jax.Array,            # (S, Or) scratch row = R
    rem_vals: jax.Array,            # (S, Or, Wr)
    rem_cols: jax.Array,            # (S, Or, Wr)
    x: jax.Array,                   # (S, Rx) with Rx >= R; padding slots zero
    use_pallas: bool = False,
    pallas_interpret: bool = False,
    pallas_version: int = 3,
) -> jax.Array:
    """y (S, R) = (DIA + row-compact ELL-remainder) @ x.

    Shifts use a zero-padded copy of x so out-of-range diagonal reads are 0
    (valid: all true entries have in-range columns; only the shift window
    over-reads).  The remainder touches only its compact rows.  With
    ``use_pallas`` the diagonal part runs as a single-pass Pallas kernel
    (ops/pallas_kernels.py) when the shape/dtype support it;
    ``pallas_version`` picks the formulation (3 = static-sublane-slice
    minimal-shift kernel, the measured winner; 2 = roll-chain kernel).
    """
    S, K, R = dia_vals.shape
    use_pallas_now = False
    if use_pallas:
        from schwarz_tpu.ops.pallas_kernels import dia_spmv_supported

        use_pallas_now = dia_spmv_supported(R, x.dtype) and len(offsets) > 0
    if use_pallas_now:
        from schwarz_tpu.ops.pallas_kernels import (
            dia_spmv_pallas2d,
            dia_spmv_pallas3,
        )

        kern = dia_spmv_pallas3 if pallas_version == 3 else dia_spmv_pallas2d
        M = max((abs(o) for o in offsets), default=0)
        xp = jnp.pad(x[:, :R], ((0, 0), (M, M)))
        y = kern(offsets, dia_vals, xp, interpret=pallas_interpret)
    else:
        y = dia_spmv(offsets, dia_vals, x)
    return apply_remainder(rem_rows, rem_vals, rem_cols, x, y)


def dia_spmv(
    offsets: Tuple[int, ...],
    dia_vals: jax.Array,            # (S, K, R)
    x: jax.Array,                   # (S, R)
) -> jax.Array:
    """Pure-DIA batched SpMV: the shift-multiply half of :func:`dia_ell_spmv`
    with no remainder machinery (used for banded preconditioner factors —
    FSAI G / G^T applies — where the remainder is zero by construction)."""
    S, K, R = dia_vals.shape
    M = max((abs(o) for o in offsets), default=0)
    xp = jnp.pad(x[:, :R], ((0, 0), (M, M)))
    y = jnp.zeros((S, R), dtype=x.dtype)
    for k, off in enumerate(offsets):
        y = y + dia_vals[:, k, :] * jax.lax.dynamic_slice_in_dim(
            xp, M + off, R, axis=1
        )
    return y


def apply_remainder(
    rem_rows: jax.Array, rem_vals: jax.Array, rem_cols: jax.Array,
    x: jax.Array, y: jax.Array,
) -> jax.Array:
    """Add the row-compact ELL remainder to y (gather volume O(Or * Wr)).

    Remainder rows are unique and ascending per subdomain (pads target the
    scratch row R, which is sliced away).  For EMULATED f64 (TPU) the
    gather and scatter run on the lossless hi/lo f32 split — XLA
    scalarizes gathers/scatters of f32-pair-emulated doubles (profiled at
    2.2 GB/s on the 512^2 flagship, 665 us per operator apply)."""
    S, R = y.shape
    idx = rem_cols.reshape(S, -1).astype(jnp.int32)
    from schwarz_tpu.ops.f64_split import f64_emulated, split_f64

    emulated = x.dtype == jnp.float64 and f64_emulated()
    if emulated:
        hi, lo = split_f64(x)
        gathered = (
            jnp.take_along_axis(hi, idx, axis=1).astype(jnp.float64)
            + jnp.take_along_axis(lo, idx, axis=1).astype(jnp.float64)
        ).reshape(rem_cols.shape)
    else:
        gathered = jnp.take_along_axis(
            x, idx, axis=1
        ).reshape(rem_cols.shape)
    # elementwise multiply + reduce: see ras._interface_contrib (XLA's
    # emulated-f64 dot_general is ~59 GB/s; the Wr contraction is tiny)
    rem_y = (rem_vals * gathered).sum(axis=-1)                # (S, Or)
    srows = jnp.broadcast_to(jnp.arange(S)[:, None], rem_rows.shape)
    ypad = jnp.pad(y, ((0, 0), (0, 1)))        # scratch row R for padded rows
    if emulated and rem_y.dtype == jnp.float64:
        rh, rl = split_f64(rem_y)
        zeros = jnp.zeros(ypad.shape, jnp.float32)
        zh = zeros.at[srows, rem_rows].set(
            rh, indices_are_sorted=True, unique_indices=True)
        zl = zeros.at[srows, rem_rows].set(
            rl, indices_are_sorted=True, unique_indices=True)
        return (ypad + (zh.astype(jnp.float64)
                        + zl.astype(jnp.float64)))[:, :R]
    return ypad.at[srows, rem_rows].add(
        rem_y, indices_are_sorted=True, unique_indices=True)[:, :R]
