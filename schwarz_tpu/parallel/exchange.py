"""Halo exchange: gather the extended-local view of the iterate.

Replaces the reference's boundary exchange (C9 two-sided
restricted_schwarz.cpp:855-973, C10 one-sided :714-852).  All strategies produce
``x_ext``: for each subdomain, the iterate restricted to its extended index space
(interior + overlap + ghost ring) — the only global data the per-iteration math
ever touches (update_boundary interface SpMV + local residual check).

Strategies (config.HaloStrategy):
  - ``all_gather``: one ``lax.all_gather`` of the interior blocks over ICI, then a
    single static gather through the halo-plan index table.  One fused collective
    per iteration; bandwidth O(S * R_int) but latency-optimal on ICI for the
    problem sizes the reference targets (its own design replicates the full
    global vector per rank, schwarz_base.cpp:340).
  - ``neighbor``: packed per-neighbor buffers via masked ``ppermute`` rounds
    (bandwidth O(halo)); see :mod:`schwarz_tpu.parallel.neighbor_exchange`.
  - ``rdma``: Pallas one-sided remote DMA (async path).

Mixed-precision halos (reference settings.hpp:122, restricted_schwarz.cpp:898-908:
double compute with float send buffers) are realized by casting the interior block
to ``halo_dtype`` before the collective and back after.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from schwarz_tpu.parallel.mesh import SUBD_AXIS


@dataclasses.dataclass
class RunPlan:
    """Contiguous-run decomposition of the halo gather/scatter.

    On TPU, XLA lowers the element-wise halo gather (``x[halo_src]``) to
    scalar-unit loads (~10 ns/element — measured ~1.3 ms per iteration for
    the 1M-row decomposition, 3x the SpMV cost).  For sorted-closure
    contiguous partitions the halo is a handful of *runs* where both the
    source index and the destination slot increment by one, so the whole
    pack/unpack becomes NR dynamic slices + NR dynamic-update-slices per
    subdomain — vector copies at HBM bandwidth.

    Runs are grouped by length (a few classes: overlap strip, ghost ring,
    ...) so every copy is exact (no overflow bytes) and the write order is
    irrelevant — semantics identical to the gather/scatter path, verified
    bit-for-bit in tests.  Unused run entries carry dst = r_ext (the
    scratch pad).  Irregular halo structure (too many runs or length
    classes — metis/unstructured partitions) returns None and the gather
    path is used.
    """

    # one table per distinct run length (exact-size copies, no overflow):
    # class c holds (S, NR_c) start tables for length lengths[c]
    lengths: tuple            # (C,) static run lengths
    run_src: tuple            # C tables, each (S, NR_c) int32 flat starts
    run_dst: tuple            # C tables, each (S, NR_c) int32 slot starts


def build_run_plan(
    halo_src: np.ndarray,      # (S, H) flat indices into (S * R_int,)
    halo_slots: np.ndarray,    # (S, H) ext-slot indices (>= r_ext = padding)
    r_ext: int,
    r_int: int,
    interior_off: np.ndarray,  # (S,) unused (kept for signature stability)
    max_runs: int = 8,
    max_classes: int = 4,
) -> Optional[RunPlan]:
    """Detect the contiguous-run structure (grouped by run length), or None
    when too irregular (falls back to the element-wise gather)."""
    S, H = halo_src.shape
    per_sub = []
    for s in range(S):
        valid = halo_slots[s] < r_ext
        src = halo_src[s][valid]
        dst = halo_slots[s][valid]
        rs = []
        i = 0
        n = src.shape[0]
        while i < n:
            j = i + 1
            while (
                j < n
                and src[j] == src[j - 1] + 1
                and dst[j] == dst[j - 1] + 1
            ):
                j += 1
            rs.append((int(src[i]), int(dst[i]), j - i))
            i = j
        if len(rs) > max_runs:
            return None
        per_sub.append(rs)
    lengths = sorted({r[2] for rs in per_sub for r in rs})
    if not lengths:
        lengths = [1]
    if len(lengths) > max_classes:
        return None
    run_src, run_dst = [], []
    for L in lengths:
        nr = max(
            (sum(1 for r in rs if r[2] == L) for rs in per_sub), default=0
        )
        nr = max(nr, 1)
        tbl_s = np.zeros((S, nr), np.int32)
        tbl_d = np.full((S, nr), r_ext, np.int32)   # unused -> scratch pad
        for s in range(S):
            k = 0
            for (src0, dst0, ln) in per_sub[s]:
                if ln == L:
                    tbl_s[s, k] = src0
                    tbl_d[s, k] = dst0
                    k += 1
        run_src.append(tbl_s)
        run_dst.append(tbl_d)
    return RunPlan(lengths=tuple(int(x) for x in lengths),
                   run_src=tuple(run_src), run_dst=tuple(run_dst))


# DUS-op budget for the unrolled runs assembly; beyond it the vmapped
# (scatter-lowered) form bounds compile time instead
UNROLL_LIMIT = 1024


def assemble_x_ext(
    x_own: jax.Array,          # (Sl, R_int)
    interior_off: jax.Array,   # (Sl,) closure slot of first interior row
    halo_slots: jax.Array,     # (Sl, H); padding entries point >= r_ext
    halo_vals: jax.Array,      # (Sl, H)
    r_ext: int,
) -> jax.Array:
    """Build the extended-local view: interior window insert + halo scatter.

    The interior is one contiguous ``dynamic_update_slice`` per subdomain (slot
    ``interior_off``; 0 for interior-first orderings).  The buffer carries
    ``R_int + 1`` scratch columns so neither the window nor padded halo entries
    can clamp/collide; the final slice drops them.  Halo scatter runs *after*
    the window write, so window-covered non-interior slots get their true
    values.
    """
    Sl, r_int = x_own.shape
    buf = jnp.zeros((Sl, r_ext + r_int + 1), x_own.dtype)
    buf = jax.vmap(
        lambda b, xo, o: jax.lax.dynamic_update_slice(b, xo, (o,))
    )(buf, x_own, interior_off)
    rows = jnp.broadcast_to(jnp.arange(Sl)[:, None], halo_slots.shape)
    buf = buf.at[rows, halo_slots].set(halo_vals.astype(x_own.dtype))
    return buf[:, :r_ext]


def assemble_x_ext_runs(
    x_own: jax.Array,          # (Sl, R_int)
    x_all_flat: jax.Array,     # (S * R_int,) gathered interior blocks
    interior_off: jax.Array,   # (Sl,)
    lengths,                   # static tuple of run lengths
    run_src,                   # per class: (Sl, NR_c)
    run_dst,                   # per class: (Sl, NR_c)
    r_ext: int,
    compute_dtype,
    uniq_offs=None,            # static distinct interior offsets (global)
) -> jax.Array:
    """Run-based x_ext assembly: exact-length vector copies per subdomain
    instead of an element-wise gather/scatter (see RunPlan).  Interior window
    first, halo runs after — the same order as assemble_x_ext, so
    window-covered halo slots get their true values.

    The subdomain loop is UNROLLED (Sl is a static shape) so every update
    is a true scalar-offset ``dynamic_update_slice``: a vmapped DUS with
    per-row offsets lowers to an element-wise TPU scatter, measured 3.7x
    slower on the 1M-row plan (467 us -> 127 us, scripts/probe_halo_runs).
    Offsets stay traced, so the same program runs on every shard_map
    device.  Very large unrolls fall back to the vmapped form to bound
    compile time."""
    Sl, r_int = x_own.shape
    L_max = max(lengths)
    pad = max(r_int, L_max) + 1
    n_runs = sum(s.shape[1] for s in run_src)
    unroll = Sl * (n_runs + 1) <= UNROLL_LIMIT
    if uniq_offs is not None:
        # K static pad variants row-selected by the traced offsets — one
        # fused full-bandwidth XLA kernel (the per-row DUS forms below
        # re-roll into a SEQUENTIAL 250 us/call loop on TPU; profiled on
        # the 512^2 flagship).  Same trick as halo_pallas.window_insert_xla.
        W = r_ext + pad
        off_col = interior_off.astype(jnp.int32)[:, None]
        buf = jnp.pad(
            x_own, ((0, 0), (uniq_offs[0], W - uniq_offs[0] - r_int)))
        for o in uniq_offs[1:]:
            v = jnp.pad(x_own, ((0, 0), (o, W - o - r_int)))
            buf = jnp.where(off_col == o, v, buf)
    elif unroll:
        buf = jnp.zeros((Sl, r_ext + pad), x_own.dtype)
        for s in range(Sl):
            buf = jax.lax.dynamic_update_slice(
                buf, x_own[s:s + 1],
                (jnp.int32(s), interior_off[s].astype(jnp.int32)),
            )
    else:
        buf = jnp.zeros((Sl, r_ext + pad), x_own.dtype)
        buf = jax.vmap(
            lambda b, xo, o: jax.lax.dynamic_update_slice(b, xo, (o,))
        )(buf, x_own, interior_off)
    # pad the source so an end-of-array start never triggers dynamic_slice
    # clamping (the scratch-directed unused entries read arbitrary starts)
    x_all_flat = jnp.pad(x_all_flat, (0, L_max))
    for L, srcs, dsts in zip(lengths, run_src, run_dst):
        for k in range(srcs.shape[1]):
            if unroll:
                for s in range(Sl):
                    v = jax.lax.dynamic_slice(
                        x_all_flat, (srcs[s, k],), (L,)
                    ).astype(compute_dtype)
                    buf = jax.lax.dynamic_update_slice(
                        buf, v[None, :],
                        (jnp.int32(s), dsts[s, k].astype(jnp.int32)),
                    )
            else:
                vals = jax.vmap(
                    lambda s0: jax.lax.dynamic_slice(x_all_flat, (s0,), (L,))
                )(srcs[:, k]).astype(compute_dtype)
                buf = jax.vmap(
                    lambda b, v, d: jax.lax.dynamic_update_slice(b, v, (d,))
                )(buf, vals, dsts[:, k])
    return buf[:, :r_ext]


def exchange_halo_allgather(
    x_own: jax.Array,          # (Sl, R_int) this device's interior blocks
    interior_off: jax.Array,   # (Sl,) closure slot of first interior row
    halo_slots: jax.Array,     # (Sl, H) ext-slot indices (>= R_ext = padding)
    halo_src: jax.Array,       # (Sl, H) flat indices into (S * R_int,)
    r_ext: int,
    halo_dtype=None,
    axis_name: str = SUBD_AXIS,
    run_plan_arrays=None,      # (run_src, run_dst, L) for the runs fast path
    tiled_plan=None,           # halo_pallas.TiledRunPlan (fused DMA path)
    tiled_tables=None,         # jnp (src_0, dst_0, src_1, dst_1, ...) shards
    fused_interpret: bool = False,
    uniq_offs=None,            # static distinct interior offsets (global)
) -> jax.Array:
    """Return x_ext (Sl, R_ext) in the compute dtype.

    Only the O(halo) non-interior slots go through gather/scatter (the interior
    is a plain copy) — on TPU, gathers run on the scalar unit, so touching
    O(R_ext) elements per iteration would dominate the whole solve.  The
    subdomain's own interior never passes through the (possibly
    reduced-precision) halo buffer, matching the reference's mixed-precision
    semantics (restricted_schwarz.cpp:898-908).
    """
    compute_dtype = x_own.dtype
    send = x_own.astype(halo_dtype) if halo_dtype is not None else x_own
    x_all = jax.lax.all_gather(send, axis_name, tiled=True)  # (S, R_int)
    if tiled_plan is not None and halo_dtype is None:
        from schwarz_tpu.ops.halo_pallas import assemble_x_ext_fused

        return assemble_x_ext_fused(
            x_own, x_all.reshape(-1), interior_off, tiled_plan,
            tiled_tables, interpret=fused_interpret,
        )
    if run_plan_arrays is not None:
        lengths, run_src, run_dst = run_plan_arrays
        return assemble_x_ext_runs(
            x_own, x_all.reshape(-1), interior_off, lengths, run_src,
            run_dst, r_ext, compute_dtype, uniq_offs=uniq_offs,
        )
    halo_vals = x_all.reshape(-1)[halo_src].astype(compute_dtype)  # (Sl, H)
    return assemble_x_ext(x_own, interior_off, halo_slots, halo_vals, r_ext)
