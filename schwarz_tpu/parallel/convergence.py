"""Global convergence detection protocols.

Reference components C16-C19 (source/solve.cpp:859-955, include/conv_tools.hpp).
Each protocol is expressed as a pure per-iteration transition on a small int/bool
state pytree inside the jitted outer loop, with cross-subdomain information moved
by ``all_gather``/``psum`` over the mesh axis — one protocol round per outer
iteration, which reproduces the per-iteration propagation latency of the
asynchronous one-sided originals under XLA's synchronous execution model.

Protocols:
  - ``allgather``:     sum of local norms vs global tolerance (solve.cpp:888-912)
                       with trust-local detection (enable_global_check,
                       solve.cpp:945-948).
  - ``allreduce``:     count of locally-converged subdomains via psum
                       (solve.cpp:949-953).  NOTE the reference's two-sided
                       allreduce branch reduces a flag that is never set (its
                       `converged_all_local` is still 0 on that path) and thus
                       never terminates; we reduce the *local* convergence flag,
                       which is the evident intent.
  - ``tree``:          centralized binary-tree push-up/push-down
                       (Yamazaki 2019; conv_tools.hpp:146-209).  The reference
                       notes its own implementation has a bug (schwarz.org:8);
                       this is the corrected protocol: a node pushes up exactly
                       once when it is locally converged and both existing
                       children have pushed; the root then broadcasts down the
                       tree, one level per iteration.
  - ``decentralized``: leader-election-free bit-vector gossip along the halo
                       graph with sent-dedup (Bahi 2005; conv_tools.hpp:212-275),
                       or MPI_Accumulate-style counter (`enable_accumulate`,
                       conv_tools.hpp:230-247).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from schwarz_tpu.config import GlobalConvergence, Settings
from schwarz_tpu.parallel.mesh import SUBD_AXIS


class ConvState(NamedTuple):
    """Protocol state, batched over this device's subdomains (Sl leading axis).

    Unused fields for a given protocol stay at shape (Sl, 1)/(Sl,) zeros so the
    pytree structure is static across protocols.
    """

    detected: jax.Array        # (Sl,) bool: this subdomain knows of global conv
    global_resnorm0: jax.Array  # () first global residual norm (allgather)
    up_done: jax.Array         # (Sl,) bool: tree — pushed to parent
    got_left: jax.Array        # (Sl,) bool: tree — left child pushed
    got_right: jax.Array       # (Sl,) bool: tree — right child pushed
    ever_local: jax.Array      # (Sl,) bool: monotone local-convergence latch
    known: jax.Array           # (Sl, S) bool: decentralized gossip bits
    sent: jax.Array            # (Sl, S) bool: decentralized dedup
    counter: jax.Array         # (Sl,) int32: accumulate variant
    counted: jax.Array         # (Sl,) bool: accumulate dedup
    res_table: jax.Array       # (Sl, S) min-so-far residual norms (C17 history)


def init_conv_state(Sl: int, S: int, dtype) -> ConvState:
    big = jnp.finfo(dtype).max
    return ConvState(
        detected=jnp.zeros(Sl, bool),
        global_resnorm0=jnp.array(-1.0, dtype),
        up_done=jnp.zeros(Sl, bool),
        got_left=jnp.zeros(Sl, bool),
        got_right=jnp.zeros(Sl, bool),
        ever_local=jnp.zeros(Sl, bool),
        known=jnp.zeros((Sl, S), bool),
        sent=jnp.zeros((Sl, S), bool),
        counter=jnp.zeros(Sl, jnp.int32),
        counted=jnp.zeros(Sl, bool),
        res_table=jnp.full((Sl, S), big, dtype),
    )


def _subd_ids(Sl: int) -> jax.Array:
    """Global subdomain ids of this device's block (requires equal blocks)."""
    d = jax.lax.axis_index(SUBD_AXIS)
    return d * Sl + jnp.arange(Sl)


def conv_step(
    settings: Settings,
    S: int,
    state: ConvState,
    local_resnorm: jax.Array,    # (Sl,)
    local_resnorm0: jax.Array,   # (Sl,)
    locally_converged: jax.Array,  # (Sl,) bool — (r/r0)^2 < tol^2 (solve.cpp:847-849)
    adj_in: jax.Array,           # (Sl, S) bool — True where q sends halo data to me
):
    """One protocol round. Returns (new_state, num_converged, global_resnorm).

    ``num_converged`` (int32 scalar) is S exactly when every subdomain may stop —
    the reference's loop-exit test ``num_converged_procs == num_subdomains``
    (schwarz_base.cpp:432).
    """
    method = settings.convergence.method
    tol = settings.tolerance
    ever = state.ever_local | locally_converged
    # current norms everywhere (solve.cpp:890-905: MPI_Allgather + sum); the
    # returned global norm must be the CURRENT sum so the divergence abort
    # (schwarz_base.cpp:424) fires on residual growth, for every method
    cur_all = jax.lax.all_gather(local_resnorm, SUBD_AXIS, tiled=True)  # (S,)
    grn_cur = jnp.sum(cur_all)
    # residual-norm table: each subdomain refreshes its own min-so-far entry,
    # then shares it by one of the two C17 protocols (conv_tools.hpp:55-142):
    #   - put_all (True): every subdomain puts its norm into EVERY table each
    #     round (put_all_local_residual_norms, hpp:55-82) — global min.
    #   - neighbor-propagate (False): each subdomain gossips its whole known
    #     table only to its halo-graph out-neighbors via MPI_Accumulate(MIN)
    #     (propagate_all_local_residual_norms, hpp:85-142) — information
    #     travels one graph edge per iteration.
    Sl_ = local_resnorm.shape[0]
    own_ids = _subd_ids(Sl_)
    table_own = state.res_table.at[jnp.arange(Sl_), own_ids].min(local_resnorm)
    if settings.convergence.put_all_local_residual_norms:
        norms_all = jax.lax.all_gather(
            table_own[jnp.arange(Sl_), own_ids], SUBD_AXIS, tiled=True)  # (S,)
        res_table = jnp.minimum(table_own, norms_all[None, :])
    else:
        tables_all = jax.lax.all_gather(
            table_own, SUBD_AXIS, tiled=True)      # (S, S)
        big = jnp.finfo(table_own.dtype).max
        from_neighbors = jnp.min(
            jnp.where(adj_in[:, :, None], tables_all[None, :, :], big),
            axis=1,
        )                                           # (Sl, S)
        res_table = jnp.minimum(table_own, from_neighbors)

    if method == GlobalConvergence.allgather:
        global_resnorm = grn_cur
        g0 = jnp.where(
            state.global_resnorm0 < 0, global_resnorm, state.global_resnorm0
        )
        # g0 == 0 means the very first residual already vanished (warm
        # start at the solution, or b == 0): 0/0 would be NaN and the
        # solve would burn max_iters undetected — define it as converged
        conv = jnp.where(g0 > 0, global_resnorm / g0, 0.0) <= tol
        num_conv = jnp.where(conv, S, 0).astype(jnp.int32)
        new = state._replace(
            detected=jnp.broadcast_to(conv, state.detected.shape),
            global_resnorm0=g0, ever_local=ever, res_table=res_table,
        )
        return new, num_conv, global_resnorm

    if method == GlobalConvergence.allreduce:
        flags = locally_converged.astype(jnp.int32)
        num_conv = jax.lax.psum(jnp.sum(flags), SUBD_AXIS).astype(jnp.int32)
        new = state._replace(
            detected=jnp.broadcast_to(num_conv >= S, state.detected.shape),
            ever_local=ever, res_table=res_table,
        )
        return new, num_conv, grn_cur

    Sl = local_resnorm.shape[0]
    ids = _subd_ids(Sl)

    if method == GlobalConvergence.tree:
        left, right = 2 * ids + 1, 2 * ids + 2
        has_left, has_right = left < S, right < S
        ready_up = (
            ever
            & (~has_left | state.got_left)
            & (~has_right | state.got_right)
            & ~state.up_done
        )
        # actions visible to others next protocol round == this outer iteration's
        # gather of *current* decisions (one tree level per outer iteration)
        push_up_all = jax.lax.all_gather(ready_up, SUBD_AXIS, tiled=True)   # (S,)
        down_now = state.detected | ((ids == 0) & ready_up)
        down_all = jax.lax.all_gather(down_now, SUBD_AXIS, tiled=True)      # (S,)
        got_left = state.got_left | jnp.where(has_left, push_up_all[left % S], False)
        got_right = state.got_right | jnp.where(has_right, push_up_all[right % S], False)
        parent = jnp.maximum(ids - 1, 0) // 2
        detected = down_now | down_all[parent]
        num_conv = jnp.where(
            jax.lax.psum(jnp.sum(detected.astype(jnp.int32)), SUBD_AXIS) >= S, S, 0
        ).astype(jnp.int32)
        new = state._replace(
            detected=detected, up_done=state.up_done | ready_up,
            got_left=got_left, got_right=got_right,
            ever_local=ever, res_table=res_table,
        )
        return new, num_conv, grn_cur

    if method == GlobalConvergence.decentralized:
        if settings.convergence.enable_accumulate:
            newly = ever & ~state.counted
            add = jax.lax.psum(
                jnp.sum(newly.astype(jnp.int32)), SUBD_AXIS
            ).astype(jnp.int32)
            counter = state.counter + add
            num_conv = jnp.where(
                jax.lax.psum(
                    jnp.sum((counter >= S).astype(jnp.int32)), SUBD_AXIS
                ) >= S, S, 0,
            ).astype(jnp.int32)
            new = state._replace(
                counter=counter, counted=state.counted | newly,
                detected=counter >= S, ever_local=ever, res_table=res_table,
            )
            return new, num_conv, grn_cur
        # gossip: broadcast newly-known bits to out-neighbors (conv_tools.hpp:249-274)
        known = state.known.at[jnp.arange(Sl), ids].max(ever)
        to_send = known & ~state.sent                    # (Sl, S)
        sent_all = jax.lax.all_gather(to_send, SUBD_AXIS, tiled=True)  # (S, S)
        incoming = jnp.einsum("ls,sk->lk", adj_in.astype(jnp.int32),
                              sent_all.astype(jnp.int32)) > 0
        new_known = known | incoming
        count = jnp.sum(new_known, axis=1)
        num_conv = jnp.where(
            jax.lax.psum(jnp.sum((count >= S).astype(jnp.int32)), SUBD_AXIS) >= S,
            S, 0,
        ).astype(jnp.int32)
        new = state._replace(
            known=new_known, sent=known, detected=count >= S,
            ever_local=ever, res_table=res_table,
        )
        return new, num_conv, grn_cur

    raise ValueError(f"unknown convergence method {method}")
