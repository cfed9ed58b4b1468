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


def exchange_halo_allgather(
    x_own: jax.Array,          # (Sl, R_int) this device's interior blocks
    halo_src: jax.Array,       # (Sl, R_ext) flat indices into (S * R_int,)
    ext_mask: jax.Array,       # (Sl, R_ext) valid-slot mask
    interior_mask: jax.Array,  # (Sl, R_int) valid interior slots
    halo_dtype=None,
    axis_name: str = SUBD_AXIS,
) -> jax.Array:
    """Return x_ext (Sl, R_ext) in the compute dtype."""
    compute_dtype = x_own.dtype
    send = x_own.astype(halo_dtype) if halo_dtype is not None else x_own
    x_all = jax.lax.all_gather(send, axis_name, tiled=True)  # (S, R_int)
    x_ext = x_all.reshape(-1)[halo_src]
    x_ext = jnp.where(ext_mask, x_ext, 0).astype(compute_dtype)
    if halo_dtype is not None:
        # only *received* values go through the reduced-precision buffer; a
        # subdomain's own interior stays full precision (the reference's mixed
        # path likewise converts only the send/recv buffers,
        # restricted_schwarz.cpp:898-908)
        r_int = x_own.shape[1]
        own = jnp.where(interior_mask, x_own, x_ext[:, :r_int])
        x_ext = x_ext.at[:, :r_int].set(own)
    return x_ext
