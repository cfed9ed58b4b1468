"""Indexed gather/scatter with combine modes — functional equivalents of the
reference device kernels (C23: include/gather.hpp:47-153, include/scatter.hpp,
source/gather_kernel.cu / scatter_kernel.cu), where
``gather: into[i] op= from[idx[i]]`` and ``scatter: into[idx[i]] op= from[i]`` with
``op in {copy, add, diff, avg}`` (include/collective_common.hpp:37).

On TPU these are XLA gather/scatter HLOs (fused by the compiler); JAX's functional
``.at[]`` replaces the reference's in-place CUDA kernels.  ``avg`` matches the
reference's definition: ``(old + new) / 2``.
"""

from __future__ import annotations

import enum

import jax
import jax.numpy as jnp


class GatherOp(enum.Enum):
    copy = "copy"
    add = "add"
    diff = "diff"
    avg = "avg"


def gather_values(
    num: int | None,
    idx: jax.Array,
    from_arr: jax.Array,
    into_arr: jax.Array,
    op: GatherOp = GatherOp.copy,
) -> jax.Array:
    """into[i] op= from[idx[i]] for i < num (reference gather.hpp:82-114).

    ``num`` may be None to use the whole index array (static shapes preferred);
    with ``num`` given, entries beyond it are left unchanged via masking.
    """
    vals = from_arr[idx]
    n = idx.shape[0]
    if op == GatherOp.copy:
        new = vals
    elif op == GatherOp.add:
        new = into_arr[:n] + vals
    elif op == GatherOp.diff:
        new = into_arr[:n] - vals
    else:
        new = (into_arr[:n] + vals) * 0.5
    if num is not None:
        mask = jnp.arange(n) < num
        new = jnp.where(mask, new, into_arr[:n])
    return into_arr.at[:n].set(new)


def scatter_values(
    num: int | None,
    idx: jax.Array,
    from_arr: jax.Array,
    into_arr: jax.Array,
    op: GatherOp = GatherOp.copy,
) -> jax.Array:
    """into[idx[i]] op= from[i] for i < num (reference scatter.hpp:82-120)."""
    n = idx.shape[0]
    vals = from_arr[:n]
    N_into = into_arr.shape[0]
    if num is not None:
        mask = jnp.arange(n) < num
        # masked entries scatter to a SCRATCH slot past the array end
        # (redirecting them to idx[0] would create duplicate .at[].set
        # writes to a live slot — jnp documents duplicate-set ordering as
        # undefined, so the real write could be nondeterministically lost)
        idx = jnp.where(mask, idx, N_into)
        into_pad = jnp.pad(into_arr, [(0, 1)] + [(0, 0)] * (into_arr.ndim - 1))
    else:
        into_pad = into_arr
    if op == GatherOp.copy:
        return into_pad.at[idx].set(vals)[:N_into]
    if op == GatherOp.add:
        vals = jnp.where(mask, vals, 0.0) if num is not None else vals
        return into_pad.at[idx].add(vals)[:N_into]
    if op == GatherOp.diff:
        vals = jnp.where(mask, vals, 0.0) if num is not None else vals
        return into_pad.at[idx].add(-vals)[:N_into]
    # avg: into[idx] = (into[idx] + from) / 2
    cur = into_pad[idx]
    new = (cur + vals) * 0.5
    return into_pad.at[idx].set(new)[:N_into]
