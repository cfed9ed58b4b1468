"""Neighbor halo exchange: packed per-device-pair buffers over ``ppermute``.

The TPU-native analogue of the reference's *gathered* two-sided exchange
(Gather -> MPI_Isend / MPI_Irecv -> Scatter, restricted_schwarz.cpp:855-973) and
of the gathered one-sided Put/Get (:714-852): per neighbor pair only the needed
elements travel, instead of the whole interior block as in the ``all_gather``
strategy.

Scheduling: communication is decomposed into *cyclic-offset rounds*.  In round
``r`` every device ``d`` sends one packed buffer to device ``(d + r) % D`` — a
pure cyclic shift, which is exactly one ``lax.ppermute`` (each device sends and
receives at most one message per round, and on a TPU torus a constant-offset
shift rides neighboring ICI links).  Only offsets with any traffic get a round
(static decision at plan-build time): a regular-1D partition needs 2 rounds,
a 2-D grid partition ~8, regardless of device count.

All tables are static (built on host at setup, cf. C7's neighbor handshake
which our full-partition visibility makes trivial):

  - ``send_idx[r]`` (D, H_r): flat offsets into the sender's interior block,
    row d = what (d + r_offset) % D needs from d, in ascending permuted-global
    order (the agreed buffer order).
  - ``recv_round`` (S, R_ext): which round delivers each ext slot (-1 = local).
  - ``recv_pos`` (S, R_ext): position of the slot's value in that round's buffer.
  - ``local_src`` (S, R_ext): intra-device flat offset for slots whose owner
    lives on the same device (incl. the subdomain's own interior).
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from schwarz_tpu.parallel.mesh import SUBD_AXIS


@dataclasses.dataclass
class NeighborPlan:
    """Host-side tables for the offset-round exchange (see module docstring)."""

    n_devices: int
    offsets: List[int]                 # cyclic device offsets, one per round
    send_idx: List[np.ndarray]         # per round: (D, H_r) int32
    recv_round: np.ndarray             # (S, R_ext) int32, -1 = local
    recv_pos: np.ndarray               # (S, R_ext) int32
    local_src: np.ndarray              # (S, R_ext) int32 into (Sl*R_int,)
    is_local: np.ndarray               # (S, R_ext) bool
    max_h: int                         # max buffer length across rounds


def build_neighbor_plan(dec, n_devices: int) -> NeighborPlan:
    """Derive the round tables from a Decomposition for a D-device mesh."""
    meta = dec.meta
    S = meta.num_subdomains
    D = n_devices
    assert S % D == 0
    Sl = S // D
    R_int = meta.max_interior
    R_ext = meta.max_ext
    first_row = dec.first_row

    _, _, ext_valid = dec.masks()
    l2g = dec.local_to_global
    owner = np.searchsorted(first_row, l2g, side="right") - 1
    owner_dev = owner // Sl
    my_dev = (np.arange(S) // Sl)[:, None]

    is_local = ext_valid & (owner_dev == my_dev)
    is_remote = ext_valid & (owner_dev != my_dev)
    # intra-device gather offsets (valid only where is_local)
    local_src = ((owner - (my_dev * Sl)) * R_int + (l2g - first_row[owner]))
    local_src = np.where(is_local, local_src, 0).astype(np.int32)

    # needed[d][e] = sorted unique permuted-global indices device d needs from e
    needed = [[None] * D for _ in range(D)]
    for d in range(D):
        subs = range(d * Sl, (d + 1) * Sl)
        for e in range(D):
            if e == d:
                continue
            vals = np.concatenate(
                [l2g[p][is_remote[p] & (owner_dev[p] == e)] for p in subs]
            )
            needed[d][e] = np.unique(vals)

    offsets = []
    for r in range(1, D):
        if any(needed[(e + r) % D][e].size for e in range(D)):
            offsets.append(r)

    send_idx: List[np.ndarray] = []
    recv_round = np.full((S, R_ext), -1, dtype=np.int32)
    recv_pos = np.zeros((S, R_ext), dtype=np.int32)
    max_h = 1
    for k, r in enumerate(offsets):
        H_r = max(max(needed[(e + r) % D][e].size for e in range(D)), 1)
        max_h = max(max_h, H_r)
        tbl = np.zeros((D, H_r), dtype=np.int32)
        for e in range(D):       # sender e -> receiver d = (e + r) % D
            d = (e + r) % D
            g = needed[d][e]
            if g.size == 0:
                continue
            own_sub = np.searchsorted(first_row, g, side="right") - 1
            tbl[e, : g.size] = (
                (own_sub - e * Sl) * R_int + (g - first_row[own_sub])
            )
            # receiver side: every ext slot of d's subdomains owned by e
            pos_of = {int(gi): i for i, gi in enumerate(g)}
            for p in range(d * Sl, (d + 1) * Sl):
                slots = np.where(is_remote[p] & (owner_dev[p] == e))[0]
                for s_ in slots:
                    recv_round[p, s_] = k
                    recv_pos[p, s_] = pos_of[int(l2g[p, s_])]
        send_idx.append(tbl)

    return NeighborPlan(
        n_devices=D,
        offsets=offsets,
        send_idx=send_idx,
        recv_round=recv_round,
        recv_pos=recv_pos,
        local_src=local_src,
        is_local=is_local,
        max_h=max_h,
    )


def exchange_halo_neighbor(
    x_own: jax.Array,            # (Sl, R_int)
    local_src: jax.Array,        # (Sl, R_ext)
    is_local: jax.Array,         # (Sl, R_ext)
    recv_round: jax.Array,       # (Sl, R_ext)
    recv_pos: jax.Array,         # (Sl, R_ext)
    send_idx: List[jax.Array],   # per round: (1, H_r) — this device's row
    offsets: List[int],
    n_devices: int,
    max_h: int,
    ext_mask: jax.Array,         # (Sl, R_ext)
    halo_dtype=None,
    axis_name: str = SUBD_AXIS,
) -> jax.Array:
    """Run the offset rounds and assemble x_ext (Sl, R_ext)."""
    compute_dtype = x_own.dtype
    flat = x_own.reshape(-1)
    send = flat.astype(halo_dtype) if halo_dtype is not None else flat

    n_rounds = len(offsets)
    # received buffers, padded to a common length; extra zero row for local slots
    bufs = jnp.zeros((n_rounds + 1, max_h), dtype=send.dtype)
    for k, r in enumerate(offsets):
        out = send[send_idx[k].reshape(-1)]          # pack
        perm = [(d, (d + r) % n_devices) for d in range(n_devices)]
        got = jax.lax.ppermute(out, axis_name, perm)  # one cyclic shift
        bufs = bufs.at[k, : got.shape[0]].set(got)

    safe_round = jnp.where(recv_round >= 0, recv_round, n_rounds)
    remote = bufs[safe_round, recv_pos].astype(compute_dtype)
    local = flat[local_src]
    x_ext = jnp.where(is_local, local, remote)
    return jnp.where(ext_mask, x_ext, 0).astype(compute_dtype)
