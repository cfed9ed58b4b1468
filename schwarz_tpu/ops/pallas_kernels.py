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
def dia_spmv_pallas2d(
    offsets: Tuple[int, ...],
    dia_vals: jax.Array,     # (S, K, R) float32, R % 128 == 0
    xpad: jax.Array,         # (S, R + 2M) float32, M = max |offset|
    interpret: bool = False,
) -> jax.Array:
    """2-D formulation: one grid step per subdomain; the whole padded x row
    lives VMEM-resident as (Rx128, 128) and every diagonal's shifted window is
    an exact lane-roll + sublane-roll + lane-index select (flat shift
    d = q*128 + r reads row i+q lanes j+r with carry) — all Mosaic-legal ops,
    no unaligned vector loads.

    Requires M (and hence the x padding) to be a multiple of 128 so the padded
    row reshapes to whole (sublane, lane) tiles; rows used never wrap (the
    read offset d = M + off stays within [0, 2M])."""
    S, K, R = dia_vals.shape
    M = max((abs(o) for o in offsets), default=0)
    Mpad = -(-M // 128) * 128
    if Mpad != M:
        # re-pad to a 128-aligned margin
        extra = Mpad - M
        xpad = jnp.pad(xpad, ((0, 0), (extra, extra)))
        M = Mpad
    assert R % 128 == 0
    W = R + 2 * M
    Rr_y = R // 128
    Rr_x = W // 128
    x3 = xpad.reshape(S, Rr_x, 128)
    dia4 = dia_vals.reshape(S, K, Rr_y, 128)

    def kernel(dia_ref, x_ref, o_ref):
        x = x_ref[0]                     # (Rr_x, 128)
        lane = jax.lax.broadcasted_iota(jnp.int32, (Rr_y, 128), 1)
        acc = jnp.zeros((Rr_y, 128), jnp.float32)
        for k in range(K):
            d = M + offsets[k]           # flat read offset, 0 <= d <= 2M
            q, rr = divmod(d, 128)
            if rr:
                # shifts must be i32 (x64 mode would make python ints i64)
                a = pltpu.roll(x, jnp.int32(128 - rr), 1)  # lanes left by rr
            else:
                a = x
            # row i of the output reads a[i + q] (no-carry lanes) or
            # a[i + q + 1] (carried lanes); rows never wrap (d <= 2M)
            b0 = pltpu.roll(a, jnp.int32(Rr_x - q), 0) if q else a
            b1 = pltpu.roll(a, jnp.int32(Rr_x - (q + 1)), 0)
            w = jnp.where(lane < 128 - rr, b0[:Rr_y], b1[:Rr_y])
            acc = acc + dia_ref[0, k] * w
        o_ref[0] = acc

    # the global x64 flag taints grid/index lowering with i64 scalars, which
    # Mosaic rejects ("failed to legalize func.return"); trace the kernel with
    # x64 disabled — all operands are explicit f32/i32 anyway
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            grid=(S,),
            in_specs=[
                pl.BlockSpec((1, K, Rr_y, 128), lambda s: (s, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Rr_x, 128), lambda s: (s, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, Rr_y, 128), lambda s: (s, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((S, Rr_y, 128), jnp.float32),
            interpret=interpret,
        )(dia4, x3)
    return out.reshape(S, R)


@functools.partial(jax.jit, static_argnames=("offsets", "interpret"))
def dia_spmv_pallas3(
    offsets: Tuple[int, ...],
    dia_vals: jax.Array,     # (S, K, R) float32, R % 128 == 0
    xpad: jax.Array,         # (S, R + 2M) float32, M = max |offset|
    interpret: bool = False,
) -> jax.Array:
    """Third-generation DIA kernel: minimal shift work per diagonal.

    ``dia_spmv_pallas2d`` rolls the whole VMEM-resident x block 2-3 times
    per diagonal (measured 131 us marginal at the 1M-row shapes — the rolls,
    not bandwidth, dominate).  Here each diagonal's shifted window
    d = q*128 + rr reads:

      - rr == 0 (offsets that are multiples of 128 — the +-n1d stencil
        neighbors and the main diagonal): a STATIC sublane-offset slice
        ``x[q : q + Rr_y]`` — pure addressing, zero vector ops;
      - rr != 0 (the +-1 neighbors): ONE lane roll of ``x[q : q + Rr_y + 1]``
        plus a two-row lane select (the carry), instead of lane+sublane roll
        chains.

    The per-diagonal work drops from ~3 full-block rolls to at most one,
    which puts the kernel back at the HBM bound: the only required traffic
    is dia_vals once + x once + y once (the ``minimal-bytes`` roofline of
    bench.py)."""
    S, K, R = dia_vals.shape
    M = max((abs(o) for o in offsets), default=0)
    Mpad = -(-M // 128) * 128
    if Mpad != M:
        extra = Mpad - M
        xpad = jnp.pad(xpad, ((0, 0), (extra, extra)))
        M = Mpad
    assert R % 128 == 0
    W = R + 2 * M
    Rr_y = R // 128
    Rr_x = W // 128
    x3 = xpad.reshape(S, Rr_x, 128)
    dia4 = dia_vals.reshape(S, K, Rr_y, 128)

    def kernel(dia_ref, x_ref, o_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (Rr_y, 128), 1)
        acc = jnp.zeros((Rr_y, 128), jnp.float32)
        for k in range(K):
            d = M + offsets[k]           # flat read offset, 0 <= d <= 2M
            q, rr = divmod(d, 128)
            if rr == 0:
                w = x_ref[0, q:q + Rr_y, :]
            else:
                a = x_ref[0, q:q + Rr_y + 1, :]
                rolled = pltpu.roll(a, jnp.int32(128 - rr), 1)  # lanes <- rr
                w = jnp.where(lane < 128 - rr, rolled[:-1], rolled[1:])
            acc = acc + dia_ref[0, k] * w
        o_ref[0] = acc

    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            grid=(S,),
            in_specs=[
                pl.BlockSpec((1, K, Rr_y, 128), lambda s: (s, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Rr_x, 128), lambda s: (s, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, Rr_y, 128), lambda s: (s, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((S, Rr_y, 128), jnp.float32),
            interpret=interpret,
        )(dia4, x3)
    return out.reshape(S, R)


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
