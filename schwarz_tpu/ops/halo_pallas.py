"""Fused halo assembly: tile-granular DMA kernel for the x_ext build.

Role: the reference's gather/scatter kernel pair for the boundary exchange
(include/gather.hpp:47-153, source/restricted_schwarz.cpp:855-973).  The XLA
runs path (`parallel/exchange.assemble_x_ext_runs`) lowers to one
``dynamic_update_slice`` dispatch per contiguous halo run — tens of kernel
launches per iteration.  This module replaces the halo-run copies with ONE
Pallas launch that issues every copy as an in-kernel DMA, overlapping them
on the DMA queues.

TPU legality (the round-3 lesson, BENCH_r03's Mosaic failure): DMA source /
destination refs may only be sliced on *leading* dims of >= 3-D refs — any
row slice of a 2-D (8, 128)-tiled memref, or unaligned 1-D offset, is
Mosaic-illegal.  So the kernel views every buffer as ``(T, tile//128, 128)``
and requires all run starts/lengths and the interior layout to be multiples
of ``tile`` (= 1024 elements, one f32 (8, 128) tile, on hardware).  The
alignment holds automatically for regular-1D partitions of generated
problems whose block sizes are 1024-multiples (the flagship configs use
``row_pad_multiple=1024``); :func:`build_tiled_plan` detects it on the host
and the solver falls back to the XLA runs path otherwise.

The interior-window insert is NOT a DMA: it is a plain XLA pad+select
(:func:`window_insert_xla`) that fuses into one full-bandwidth kernel.  The
window buffer is then donated to the Pallas call (``input_output_aliases``),
so the kernel only issues the O(halo) run copies — the window-covered halo
slots are overwritten by the runs, the same write order as the XLA paths
(bit-for-bit identical, tests/test_halo_pallas.py).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# one float32 (8, 128) VMEM/HBM tile — the DMA slicing granularity
TILE = 1024


@dataclasses.dataclass(frozen=True)
class TiledRunPlan:
    """Host-side tile-unit halo copy plan (everything static but the tables).

    ``src_t[c][s, k]`` / ``dst_t[c][s, k]``: tile-unit start of run ``k`` of
    length class ``c`` for subdomain ``s`` — source into the flat gathered
    interior blocks, destination within the subdomain's ext row.  Unused
    entries carry ``dst == r_ext_t`` (guarded off in the kernel).
    """

    tile: int
    lengths_t: Tuple[int, ...]           # static run lengths (tiles)
    src_t: Tuple[np.ndarray, ...]        # (S, NR_c) int32
    dst_t: Tuple[np.ndarray, ...]        # (S, NR_c) int32
    uniq_offs: Tuple[int, ...]           # distinct interior offsets (elements)
    r_int_t: int
    r_ext_t: int


def build_tiled_plan(
    run_plan,                   # exchange.RunPlan
    interior_off: np.ndarray,   # (S,) element offsets
    r_int: int,
    r_ext: int,
    s_total: int,
    tile: int = TILE,
) -> Optional[TiledRunPlan]:
    """Convert a RunPlan to tile units, or None when not tile-aligned.

    Requirements (all checked): r_int, r_ext, every interior offset, every
    valid run start (src and dst) and every run length divisible by
    ``tile``; window fits (off + r_int <= r_ext); at most 4 distinct
    interior offsets (the XLA window insert reads one padded variant per
    distinct offset).
    """
    if r_int % tile or r_ext % tile or (s_total * r_int) % tile:
        return None
    offs = np.asarray(interior_off, np.int64)
    if (offs % tile).any() or (offs + r_int > r_ext).any():
        return None
    uniq = tuple(sorted(set(int(o) for o in offs)))
    if len(uniq) > 4:
        return None
    lengths_t, src_t, dst_t = [], [], []
    for L, ts, td in zip(run_plan.lengths, run_plan.run_src,
                         run_plan.run_dst):
        if L % tile:
            return None
        valid = td < r_ext
        if (ts[valid] % tile).any() or (td[valid] % tile).any():
            return None
        if ((td[valid] + L) > r_ext).any():
            return None
        lengths_t.append(L // tile)
        src_t.append((ts // tile).astype(np.int32))
        # sentinel r_ext -> exactly r_ext_t after the div (r_ext % tile == 0)
        dst_t.append((td // tile).astype(np.int32))
    return TiledRunPlan(
        tile=tile,
        lengths_t=tuple(lengths_t),
        src_t=tuple(src_t),
        dst_t=tuple(dst_t),
        uniq_offs=uniq,
        r_int_t=r_int // tile,
        r_ext_t=r_ext // tile,
    )


def fused_assemble_supported(tiled_plan, dtype) -> bool:
    """The kernel copies raw f32 tiles (mixed halo dtypes use the XLA path)."""
    return tiled_plan is not None and jnp.dtype(dtype) == jnp.float32


def window_insert_xla(
    x_own: jax.Array,          # (Sl, R_int)
    interior_off: jax.Array,   # (Sl,) int32 (traced; device-local values)
    uniq_offs: Tuple[int, ...],  # static: global distinct offsets
    r_ext: int,
) -> jax.Array:
    """Zeros + interior window at per-subdomain offset, as pad + select.

    One ``jnp.pad`` variant per distinct offset, row-selected by the traced
    offsets — a single fused XLA kernel (k reads + 1 write), uniform across
    shard_map devices (the variant set is the global host-known one).
    """
    Sl, r_int = x_own.shape
    off_col = interior_off.astype(jnp.int32)[:, None]
    out = jnp.pad(x_own, ((0, 0), (uniq_offs[0], r_ext - uniq_offs[0] - r_int)))
    for o in uniq_offs[1:]:
        v = jnp.pad(x_own, ((0, 0), (o, r_ext - o - r_int)))
        out = jnp.where(off_col == o, v, out)
    return out


@functools.partial(jax.jit, static_argnames=(
    "lengths_t", "r_ext_t", "tile", "interpret"))
def assemble_runs_fused(
    window_buf: jax.Array,     # (Sl, r_ext) f32 — donated, becomes the output
    x_all_flat: jax.Array,     # (S * R_int,) f32 gathered interior blocks
    src_t,                     # tuple of (Sl, NR_c) int32 tile-start tables
    dst_t,                     # tuple of (Sl, NR_c) int32 tile-start tables
    lengths_t: Tuple[int, ...],
    r_ext_t: int,
    tile: int = TILE,
    interpret: bool = False,
) -> jax.Array:
    """Overwrite the halo runs of ``window_buf`` via in-kernel DMA copies.

    All table values are tile units; sentinel dst == r_ext_t entries are
    skipped.  Every copy slices only leading dims of (T, tile//128, 128)
    refs — Mosaic-legal at arbitrary dynamic offsets.
    """
    Sl, r_ext = window_buf.shape
    n_cls = len(lengths_t)
    assert len(src_t) == n_cls and len(dst_t) == n_cls
    rows = tile // 128

    smem_in = []
    for ts, td in zip(src_t, dst_t):
        smem_in.append(ts.reshape(-1).astype(jnp.int32))
        smem_in.append(td.reshape(-1).astype(jnp.int32))

    w3 = window_buf.reshape(Sl * r_ext_t, rows, 128)
    x3 = x_all_flat.reshape(-1, rows, 128)

    def kernel(*refs):
        cls_refs = refs[:2 * n_cls]
        x_all_ref, win_ref, out_ref, sem = refs[2 * n_cls:]
        del win_ref   # aliased to out: the window content is already there
        dmas = []
        for c, Lt in enumerate(lengths_t):
            src_ref, dst_ref = cls_refs[2 * c], cls_refs[2 * c + 1]
            nr = src_t[c].shape[1]
            for s in range(Sl):
                for k in range(nr):
                    dst0 = dst_ref[s * nr + k]
                    dma = pltpu.make_async_copy(
                        x_all_ref.at[pl.ds(src_ref[s * nr + k], Lt)],
                        out_ref.at[pl.ds(s * r_ext_t + dst0, Lt)],
                        sem,
                    )

                    @pl.when(dst0 < r_ext_t)
                    def _(dma=dma):
                        dma.start()

                    dmas.append((dst0, dma))
        for dst0, dma in dmas:
            @pl.when(dst0 < r_ext_t)
            def _(dma=dma):
                dma.wait()

    n_smem = 2 * n_cls
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            in_specs=(
                [pl.BlockSpec(memory_space=pltpu.SMEM)] * n_smem
                + [pl.BlockSpec(memory_space=pltpu.HBM)] * 2
            ),
            out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
            out_shape=jax.ShapeDtypeStruct((Sl * r_ext_t, rows, 128),
                                           jnp.float32),
            scratch_shapes=[pltpu.SemaphoreType.DMA(())],
            input_output_aliases={n_smem + 1: 0},
            interpret=interpret,
        )(*smem_in, x3, w3)
    return out.reshape(Sl, r_ext)


def assemble_x_ext_fused(
    x_own: jax.Array,          # (Sl, R_int) f32
    x_all_flat: jax.Array,     # (S * R_int,) f32
    interior_off: jax.Array,   # (Sl,) int32
    tiled_plan: TiledRunPlan,
    run_tables,                # (src_t jnp tables..., dst_t jnp tables...)
    interpret: bool = False,
) -> jax.Array:
    """Full fused x_ext assembly: XLA window insert + DMA halo runs.

    ``run_tables`` carries the (possibly device-sharded) jnp copies of the
    plan's tile tables as ``(src_0, dst_0, src_1, dst_1, ...)``.
    """
    tp = tiled_plan
    r_ext = tp.r_ext_t * tp.tile
    win = window_insert_xla(x_own, interior_off, tp.uniq_offs, r_ext)
    src_t = tuple(run_tables[2 * c] for c in range(len(tp.lengths_t)))
    dst_t = tuple(run_tables[2 * c + 1] for c in range(len(tp.lengths_t)))
    return assemble_runs_fused(
        win, x_all_flat, src_t, dst_t, tp.lengths_t, tp.r_ext_t,
        tile=tp.tile, interpret=interpret,
    )
