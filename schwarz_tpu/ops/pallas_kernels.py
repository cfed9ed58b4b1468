"""Pallas TPU kernels for the hot compute path.

``dia_spmv_pallas``: banded (DIA) SpMV.  One grid step processes a row tile of
one subdomain; the subdomain's whole padded x-vector block stays VMEM-resident
across its row tiles (the block index is constant in the tile dimension, so
Mosaic does not re-fetch it), and each diagonal contribution is a static-offset
VMEM slice multiply-add on the VPU — single pass over the diagonal values,
no intermediate HBM traffic between diagonals (the XLA fallback materializes a
temporary per diagonal).

Layout: dia_vals (S, K, R) f32, xpad (S, R + 2M) f32 with M = max |offset|
(zero-padded), output (S, R).  R must be a multiple of the tile size.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tile(r: int) -> int:
    for t in (4096, 2048, 1024, 512, 256, 128):
        if r % t == 0:
            return t
    return 0


def dia_spmv_supported(r: int, dtype) -> bool:
    return _pick_tile(r) > 0 and jnp.dtype(dtype) == jnp.float32


@functools.partial(jax.jit, static_argnames=("offsets", "interpret"))
def dia_spmv_pallas(
    offsets: Tuple[int, ...],
    dia_vals: jax.Array,     # (S, K, R) float32
    xpad: jax.Array,         # (S, R + 2M) float32, M = max |offset|
    interpret: bool = False,
) -> jax.Array:
    """y[s, r] = sum_k dia_vals[s, k, r] * xpad[s, M + r + off_k]."""
    S, K, R = dia_vals.shape
    M = max((abs(o) for o in offsets), default=0)
    assert xpad.shape == (S, R + 2 * M), (xpad.shape, (S, R + 2 * M))
    T = _pick_tile(R)
    assert T > 0, f"R={R} not tileable"
    n_tiles = R // T
    # Mosaic requires the last two block dims to divide (8, 128) or equal the
    # array dims; a singleton middle axis makes the per-subdomain row blocks
    # (1, 1, W) legal.  The extra 128 tail covers the aligned-window over-read.
    W_x = R + 2 * M + 128
    xpad3 = jnp.pad(xpad, ((0, 0), (0, 128))).reshape(S, 1, W_x)

    def kernel(dia_ref, x_ref, o_ref):
        t = pl.program_id(1)
        base = pl.multiple_of(t * T, T)

        def shifted_window(off):
            # Mosaic requires 128-aligned vector loads: load the aligned
            # 128-padded window (kept 2-D — 1-D rotates are unsupported) and
            # rotate the lanes into place
            aligned = (M + off) // 128 * 128
            rem = (M + off) - aligned
            w = x_ref[0, :, pl.ds(base + aligned, T + 128)]   # (1, T+128)
            if rem:
                # roll requires a non-negative shift: left-rotate by rem ==
                # right-rotate by (len - rem)
                w = pltpu.roll(w, jnp.int32((T + 128) - rem), 1)
            return w[:, :T]

        acc = dia_ref[0, 0:1, :] * shifted_window(offsets[0])
        for k in range(1, K):
            acc = acc + dia_ref[0, k: k + 1, :] * shifted_window(offsets[k])
        o_ref[0, :, :] = acc

    out = pl.pallas_call(
        kernel,
        grid=(S, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, K, T), lambda s, t: (s, 0, t), memory_space=pltpu.VMEM
            ),
            # whole padded x row per subdomain; constant in t -> fetched once
            pl.BlockSpec(
                (1, 1, W_x), lambda s, t: (s, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, T), lambda s, t: (s, 0, t), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((S, 1, R), jnp.float32),
        interpret=interpret,
    )(dia_vals, xpad3)
    return out.reshape(S, R)
