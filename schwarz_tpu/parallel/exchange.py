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

import jax
import jax.numpy as jnp

from schwarz_tpu.parallel.mesh import SUBD_AXIS


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


def exchange_halo_allgather(
    x_own: jax.Array,          # (Sl, R_int) this device's interior blocks
    interior_off: jax.Array,   # (Sl,) closure slot of first interior row
    halo_slots: jax.Array,     # (Sl, H) ext-slot indices (>= R_ext = padding)
    halo_src: jax.Array,       # (Sl, H) flat indices into (S * R_int,)
    r_ext: int,
    halo_dtype=None,
    axis_name: str = SUBD_AXIS,
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
    halo_vals = x_all.reshape(-1)[halo_src].astype(compute_dtype)  # (Sl, H)
    return assemble_x_ext(x_own, interior_off, halo_slots, halo_vals, r_ext)
