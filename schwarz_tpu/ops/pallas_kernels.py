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
    # (1, 1, W) legal.
    xpad3 = xpad.reshape(S, 1, R + 2 * M)

    def kernel(dia_ref, x_ref, o_ref):
        t = pl.program_id(1)
        base = t * T
        acc = dia_ref[0, 0, :] * x_ref[0, 0, pl.ds(base + M + offsets[0], T)]
        for k in range(1, K):
            acc = acc + dia_ref[0, k, :] * x_ref[
                0, 0, pl.ds(base + M + offsets[k], T)
            ]
        o_ref[0, 0, :] = acc

    out = pl.pallas_call(
        kernel,
        grid=(S, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, K, T), lambda s, t: (s, 0, t), memory_space=pltpu.VMEM
            ),
            # whole padded x row per subdomain; constant in t -> fetched once
            pl.BlockSpec(
                (1, 1, R + 2 * M), lambda s, t: (s, 0, 0),
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
