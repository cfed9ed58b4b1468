"""Free-running asynchronous RAS on arbitrary graphs (unstructured matrices).

Extends the banded 1-D (ops/async_ras.py) and block-grid 2-D
(ops/async_ras_2d.py) free-running kernels to ANY matrix + ANY partition
(e.g. metis partitions of the anisotropic FEM matrices ani3/ani4 the
reference ships) — the full scope of the reference's asynchronous mode
(source/restricted_schwarz.cpp:714-852 works on arbitrary subdomain
graphs discovered by the neighbor handshake, restricted_schwarz.cpp:307-604).

Design (TPU-first, zero gathers in-kernel):

- **The async rank is the subdomain** (the reference's MPI rank), `Sl = S/D`
  ranks folded per device.  ALL halo traffic — including between
  same-device subdomains — rides one-sided DMA slot rings with the same
  ack-credit flow control and bounded staleness ``B`` as the 1-D kernel,
  so a D=1 run still exercises the full asynchronous message protocol
  (self-DMAs), and semantics do not change with the device count.
- **Edge-colored links**: the subdomain adjacency graph is greedily
  edge-colored (C <= maxdegree+1 colors); each rank has at most one link
  per color, so every ring slot is addressed by the static tuple
  (round slot j, local rank s, color c) — the SPMD kernel runs identical
  static control flow on every device, with per-device *tables* (pack /
  unpack matrices, link targets) carrying the graph structure.  Ranks
  missing a color send to themselves (masked dummy links) so DMA counts
  stay uniform — the static-drain bookkeeping of the 1-D kernel carries
  over unchanged.
- **One-hot matmul pack/unpack**: messages are packed with a per-link
  one-hot matrix (SEG x Rint) against the sender's interior values and
  scattered into the receiver's halo with (H x SEG) one-hot matrices —
  MXU work instead of scalar-unit gathers (XLA-style index gathers run
  at ~10 ns/element on TPU and Mosaic has no general gather).  Values
  ride lane-replicated ``(rows, 128)`` tiles.
- **Dense local operators**: each rank's extended system (interior +
  overlap closure + one Dirichlet frontier ring) is densified at setup;
  the local solve is ``ninner`` Jacobi-PCG iterations whose matvec is one
  (Rext, Rext) @ (Rext, 128) MXU matmul.  Dense-ifying is the TPU answer
  for the small unstructured subdomains this mode targets (the banded /
  grid kernels cover the large structured problems); a VMEM budget gate
  raises NotImplementedFeature for oversized instances.

Convergence detection is the in-band decentralized gossip of the 1-D
kernel (conv_tools.hpp:212-275): every message carries the sender's
known-converged bit-vector (lane per rank), each rank latches its own bit
on local convergence, merges incoming vectors, records ``done_at`` and
freezes.  Chunk launches, warm-up halo carry, and uniform static drains
are inherited from ops/async_ras.py (see its docstring for the protocol
proofs; the per-(s, c) bookkeeping here is the per-direction bookkeeping
there, instantiated per colored link).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from schwarz_tpu.exceptions import NotImplementedFeature


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _lane_rep(a2: np.ndarray) -> np.ndarray:
    """(S, Rext) -> (S*Rext, 128) lane-replicated f32."""
    return np.repeat(a2.reshape(-1, 1), 128, axis=1).astype(np.float32)


@dataclasses.dataclass
class GeneralAsyncPlan:
    """Host-side static tables for the general free-running kernel."""

    S: int
    N: int
    Rint: int               # padded interior rows per rank
    H: int                  # padded halo slots per rank
    Rext: int               # Rint + H
    SEG: int                # padded message width (values per link)
    C: int                  # number of link colors
    n_int: np.ndarray       # (S,) true interior counts
    int_ids: tuple          # per-rank interior global ids (ascending)
    A: np.ndarray           # (S, Rext, Rext) f32 dense extended operators
    b: np.ndarray           # (S, Rext) f32
    dinv: np.ndarray        # (S, Rext) f32 Jacobi inverse diagonal
    mask_dom: np.ndarray    # (S, Rext) f32 — solve domain rows
    mask_int: np.ndarray    # (S, Rext) f32 — owned interior rows
    OH: np.ndarray          # (S, C, SEG, Rint) f32 pack one-hots
    U: np.ndarray           # (S, C, H, SEG) f32 unpack one-hots
    tgt_subd: np.ndarray    # (S, C) int32 partner rank (self for dummies)
    send_len: np.ndarray    # (S, C) int32 true values sent on each link
    gid: np.ndarray         # (S, Rext) int32 global row per slot (-1 pad)
    boost: "np.ndarray | None" = None   # (S, Rext) O-RAS Robin diag term


def build_general_plan(mat, rhs, part, overlap: int,
                       oras_weight: float = 0.0) -> GeneralAsyncPlan:
    """Extract dense extended operators + edge-colored link tables.

    ``mat``: CSRMatrix; ``part``: (N,) subdomain id per row (any partition,
    e.g. core.partition.make_partition metis output); ``overlap`` >= 1.
    ``oras_weight`` adds the O-RAS Robin diagonal on solve-domain rows with
    couplings dropped at the artificial interface (preconditioner form —
    see async_ras.build_async_plan).
    """
    import scipy.sparse as sp

    A_sp = mat.to_scipy().tocsr()
    N = A_sp.shape[0]
    part = np.asarray(part, np.int64)
    if part.shape != (N,):
        raise ValueError(f"partition shape {part.shape} != ({N},)")
    S = int(part.max()) + 1
    if S > 128:
        raise NotImplementedFeature(
            "free-running gossip packs one lane per rank: S <= 128"
        )
    ovp = max(int(overlap), 1)
    G = A_sp != 0
    G = ((G + G.T) > 0).tocsr()

    int_ids = tuple(np.flatnonzero(part == s) for s in range(S))
    if any(ids.size == 0 for ids in int_ids):
        raise ValueError("empty subdomain in partition")

    # BFS closure (depth ovp) + one Dirichlet frontier ring per rank
    closures, frontiers = [], []
    for s in range(S):
        in_clos = np.zeros(N, dtype=bool)
        in_clos[int_ids[s]] = True
        layer = int_ids[s]
        for _ in range(ovp):
            nxt = np.unique(G[layer].indices)
            layer = nxt[~in_clos[nxt]]
            in_clos[layer] = True
        nxt = np.unique(G[np.flatnonzero(in_clos)].indices)
        fr = nxt[~in_clos[nxt]]
        closures.append(np.flatnonzero(in_clos))
        frontiers.append(np.sort(fr))

    # halo = (closure - interior) + frontier, grouped by owner, sorted
    halo_ids, halo_by_owner = [], []
    for s in range(S):
        clos_non_int = np.setdiff1d(closures[s], int_ids[s],
                                    assume_unique=True)
        hid = np.union1d(clos_non_int, frontiers[s])
        owners = part[hid]
        order = np.lexsort((hid, owners))
        hid = hid[order]
        halo_ids.append(hid)
        by = {}
        for o in np.unique(owners[order]):
            by[int(o)] = hid[owners[order] == o]
        halo_by_owner.append(by)

    # need[s][o] = global ids rank s needs from rank o (s's halo order)
    # links: undirected edges where either side needs values
    edges = set()
    for s in range(S):
        for o in halo_by_owner[s]:
            if o != s:
                edges.add((min(s, o), max(s, o)))
    # greedy edge coloring: at most one link per color per rank
    color_of = {}
    used = [set() for _ in range(S)]
    for e in sorted(edges):
        a, bb = e
        c = 0
        while c in used[a] or c in used[bb]:
            c += 1
        color_of[e] = c
        used[a].add(c)
        used[bb].add(c)
    C = max((c for c in color_of.values()), default=-1) + 1
    C = max(C, 1)

    n_int = np.array([ids.size for ids in int_ids], np.int64)
    n_halo = np.array([h.size for h in halo_ids], np.int64)
    Rint = _round_up(int(n_int.max()), 8)
    H = _round_up(int(n_halo.max()), 8)
    Rext = Rint + H
    seg_max = 1
    for s in range(S):
        for o, ids in halo_by_owner[s].items():
            if o != s:
                seg_max = max(seg_max, ids.size)
    SEG = _round_up(seg_max, 8)

    A = np.zeros((S, Rext, Rext), np.float32)
    b = np.zeros((S, Rext), np.float32)
    dinv = np.ones((S, Rext), np.float32)
    mask_dom = np.zeros((S, Rext), np.float32)
    mask_int = np.zeros((S, Rext), np.float32)
    OH = np.zeros((S, C, SEG, Rint), np.float32)
    U = np.zeros((S, C, H, SEG), np.float32)
    tgt_subd = np.tile(
        np.arange(S, dtype=np.int32)[:, None], (1, C)
    )
    send_len = np.zeros((S, C), np.int32)

    gid = np.full((S, Rext), -1, np.int32)
    rhs_np = np.asarray(rhs, np.float64)
    for s in range(S):
        ext = np.concatenate([int_ids[s], halo_ids[s]])
        slot_of = {}
        for k, g in enumerate(int_ids[s]):
            slot_of[int(g)] = k
        for k, g in enumerate(halo_ids[s]):
            slot_of[int(g)] = Rint + k
        dom = set(closures[s].tolist())
        # rows
        for g in ext:
            i = slot_of[int(g)]
            gid[s, i] = g
            if int(g) in dom:
                lo, hi = A_sp.indptr[g], A_sp.indptr[g + 1]
                for gc, v in zip(A_sp.indices[lo:hi], A_sp.data[lo:hi]):
                    j = slot_of.get(int(gc))
                    assert j is not None, (
                        "BFS closure must contain every domain coupling"
                    )
                    A[s, i, j] = v
                b[s, i] = rhs_np[g]
                d = A[s, i, i]
                dinv[s, i] = 1.0 / d if d != 0 else 1.0
                mask_dom[s, i] = 1.0
            else:
                A[s, i, i] = 1.0
        # padding rows act as identity
        for i in list(range(int(n_int[s]), Rint)) + list(
            range(Rint + int(n_halo[s]), Rext)
        ):
            A[s, i, i] = 1.0
        mask_int[s, : n_int[s]] = 1.0
        # links (a link may be one-sided: only one end needs values)
        own_pos = {int(g): k for k, g in enumerate(int_ids[s])}
        for (a, bb), c in color_of.items():
            if s not in (a, bb):
                continue
            o = bb if s == a else a
            tgt_subd[s, c] = o
            # pack: what o needs from me, in o's halo order
            send_ids = halo_by_owner[o].get(s, np.empty(0, np.int64))
            send_len[s, c] = send_ids.size
            for k, g in enumerate(send_ids):
                OH[s, c, k, own_pos[int(g)]] = 1.0
            # unpack: what I need from o -> my halo slots
            recv_ids = halo_by_owner[s].get(o, np.empty(0, np.int64))
            for k, g in enumerate(recv_ids):
                U[s, c, slot_of[int(g)] - Rint, k] = 1.0

    boost = None
    if oras_weight:
        c0 = float(oras_weight)
        if not -1.0 <= c0 <= 0.0:
            raise ValueError(
                f"oras_weight={c0} outside [-1, 0]: the Robin coefficient "
                "must sit in (-1, 0] (0 = Dirichlet, -1 = Neumann limit)"
            )
        # couplings of solve-domain rows to non-domain slots (the frontier
        # ring the restricted CG treats as Dirichlet)
        boost = (c0 * np.einsum(
            "sij,sj->si", np.abs(A), 1.0 - mask_dom
        ) * mask_dom).astype(np.float32)
        dg = np.einsum("sii->si", A) + boost
        dinv = np.where(
            (np.abs(dg) > 0) & (mask_dom > 0),
            1.0 / np.where(dg == 0, 1, dg), 1.0
        ).astype(np.float32)

    return GeneralAsyncPlan(
        S=S, N=N, Rint=Rint, H=H, Rext=Rext, SEG=SEG, C=C,
        n_int=n_int, int_ids=int_ids, A=A, b=b, dinv=dinv,
        mask_dom=mask_dom, mask_int=mask_int, OH=OH, U=U,
        tgt_subd=tgt_subd, send_len=send_len, gid=gid, boost=boost,
    )


def vmem_estimate_bytes(p: GeneralAsyncPlan, Sl: int, staleness: int) -> int:
    """Rough per-device VMEM footprint of the kernel (gate before compile)."""
    M = 2 * max(staleness, 1) + 2
    MSG = p.SEG + 8
    f = 4
    ops = Sl * p.Rext * p.Rext * f          # A
    nvec = 4 + (1 if p.boost is not None else 0)
    ops += nvec * Sl * p.Rext * 128 * f     # b, dinv, masks[, boost]
    ops += Sl * p.C * p.SEG * p.Rint * f    # OH
    ops += Sl * p.C * p.H * p.SEG * f       # U
    rings = 2 * M * Sl * p.C * MSG * 128 * f    # send + recv
    rings += 2 * M * Sl * p.C * 8 * 128 * f     # ack bufs
    state = Sl * (p.Rint + 16 + p.C * p.SEG) * 128 * f * 2
    return ops + rings + state


@functools.partial(
    jax.jit,
    static_argnames=(
        "Rint", "Rext", "H", "SEG", "C", "Sl", "rounds", "staleness",
        "ninner", "tol", "n_ranks", "axis_name", "interpret", "nonsym",
        "mxu_precision",
    ),
)
def async_general_rounds(
    A, b, dinv, mdom, mint, OH, U, tgt_dev, tgt_sl,
    x, known, aux, carry, boost=None,
    *,
    Rint: int, Rext: int, H: int, SEG: int, C: int, Sl: int,
    rounds: int, staleness: int, ninner: int, tol: float,
    n_ranks: int, axis_name: str, interpret: bool, nonsym: bool = False,
    mxu_precision: str = "default",
):
    """Run ``rounds`` free-running iterations of every rank on this device.

    Per-device shapes (already sharded): A (Sl, Rext, Rext);
    b/dinv/mdom/mint (Sl*Rext, 128) lane-replicated; OH (Sl*C*SEG, Rint);
    U (Sl*C*H, SEG); tgt_dev/tgt_sl (Sl, C) int32; x (Sl*Rint, 128);
    known/aux (Sl*8, 128); carry (Sl*C*SEG, 128).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = max(staleness, 1)
    M = 2 * B + 2
    T = rounds
    MSG = SEG + 8
    L = Sl * C                     # links per device
    tol2 = float(tol) * float(tol)

    use_oras = boost is not None
    NIN = 14 if use_oras else 13
    # "highest" forces f32-accurate MXU passes on the A-dots.  The DEFAULT
    # MXU precision truncates f32 operands to bf16 per pass; measured on
    # v5e, that noise compounds through the free-running iteration and
    # floors the in-band relative residual around 1e-1 (interpret mode,
    # exact f32, converges).  HIGHEST costs extra VMEM stack (operand
    # splitting) — the driver enables it when the footprint allows and
    # otherwise documents the refinement recipe (run_refined restarts
    # contract the floor per cycle).
    A_PREC = (jax.lax.Precision.HIGHEST if mxu_precision == "highest"
              else None)

    def kernel(*refs):
        (A_ref, b_ref, dinv_ref, mdom_ref, mint_ref, OH_ref, U_ref,
         td_ref, ts_ref, x_ref, known_ref, aux_ref, carry_ref) = refs[:13]
        boost_ref = refs[13] if use_oras else None
        (x_out, known_out, aux_out, carry_out) = refs[NIN:NIN + 4]
        (send, recv, ackpay, ackbuf,
         ssem, rsem, asem, arsem) = refs[NIN + 4:]
        me = jax.lax.axis_index(axis_name)
        devty = pltpu.DeviceIdType.LOGICAL

        def flat(j, s, c):
            return (j * Sl + s) * C + c

        def send_desc(s, c, j):
            fs = flat(j, s, c)
            td = td_ref[s, c]
            fd = (j * Sl + ts_ref[s, c]) * C + c
            return pltpu.make_async_remote_copy(
                src_ref=send.at[fs], dst_ref=recv.at[fd],
                send_sem=ssem.at[fs], recv_sem=rsem.at[fd],
                device_id=td, device_id_type=devty,
            )

        def recv_wait_desc(s, c, j):
            # arrival waits touch only (recv_sem, dst size): build a
            # self-shaped descriptor for OUR slot (the sender signalled it)
            fs = flat(j, s, c)
            return pltpu.make_async_remote_copy(
                src_ref=send.at[fs], dst_ref=recv.at[fs],
                send_sem=ssem.at[fs], recv_sem=rsem.at[fs],
                device_id=me, device_id_type=devty,
            )

        def ack_desc(s, c, j):
            # credit the partner for the message in OUR slot (j, s, c):
            # it lands in the partner's ack buffer at ITS slot for this link
            fs = flat(j, s, c)
            td = td_ref[s, c]
            fd = (j * Sl + ts_ref[s, c]) * C + c
            return pltpu.make_async_remote_copy(
                src_ref=ackpay, dst_ref=ackbuf.at[fd],
                send_sem=asem.at[fs], recv_sem=arsem.at[fd],
                device_id=td, device_id_type=devty,
            )

        def ack_wait_desc(s, c, j):
            fs = flat(j, s, c)
            return pltpu.make_async_remote_copy(
                src_ref=ackpay, dst_ref=ackbuf.at[fs],
                send_sem=asem.at[fs], recv_sem=arsem.at[fs],
                device_id=me, device_id_type=devty,
            )

        ackpay[:] = jnp.zeros((8, 128), jnp.float32)

        lane8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        pad_ranks = jnp.where(lane8 >= n_ranks, 1.0, 0.0)

        A_s = [A_ref[s] for s in range(Sl)]
        b_s = [b_ref[s * Rext:(s + 1) * Rext] for s in range(Sl)]
        dv_s = [dinv_ref[s * Rext:(s + 1) * Rext] for s in range(Sl)]
        md_s = [mdom_ref[s * Rext:(s + 1) * Rext] for s in range(Sl)]
        mi_s = [mint_ref[s * Rext:(s + 1) * Rext] for s in range(Sl)]
        bo_s = ([boost_ref[s * Rext:(s + 1) * Rext] for s in range(Sl)]
                if use_oras else None)
        OH_sc = [
            [OH_ref[(s * C + c) * SEG:(s * C + c + 1) * SEG]
             for c in range(C)] for s in range(Sl)
        ]
        U_sc = [
            [U_ref[(s * C + c) * H:(s * C + c + 1) * H]
             for c in range(C)] for s in range(Sl)
        ]

        def dot(u, v):
            t1 = jnp.sum(u * v, axis=1, keepdims=True)
            return jnp.sum(t1, axis=0, keepdims=True)

        def apply_solve(s, v):
            # O-RAS Robin diagonal on the solve operator only; the
            # residual keeps the true A (fixed point unchanged)
            av = md_s[s] * jnp.dot(
                A_s[s], v, preferred_element_type=jnp.float32,
                precision=A_PREC,
            )
            if use_oras:
                av = av + bo_s[s] * v
            return av

        def cg_dom(s, r):
            eps = jnp.finfo(jnp.float32).tiny
            z0 = jnp.zeros_like(r)
            s0 = dv_s[s] * r
            rho0 = dot(r, s0)

            def body(_, cstate):
                zz, rr_, pp, rho = cstate
                ap = apply_solve(s, pp)
                pap = dot(pp, ap)
                alpha = jnp.where(pap > 0, rho / jnp.maximum(pap, eps), 0.0)
                zz = zz + alpha * pp
                rr_ = rr_ - alpha * ap
                sn = dv_s[s] * rr_
                rho_n = dot(rr_, sn)
                beta = jnp.where(rho > 0, rho_n / jnp.maximum(rho, eps), 0.0)
                return zz, rr_, sn + beta * pp, rho_n

            z, _, _, _ = jax.lax.fori_loop(
                0, ninner, body, (z0, r, s0, rho0)
            )
            return z

        def local_correct(s, r):
            if nonsym:
                from schwarz_tpu.ops.async_ras import _bicgstab_correction

                return _bicgstab_correction(
                    lambda v: apply_solve(s, v), dot, dv_s[s], r, ninner
                )
            return cg_dom(s, r)

        xx = [x_ref[s * Rint:(s + 1) * Rint] for s in range(Sl)]
        kn = [
            jnp.maximum(known_ref[s * 8:(s + 1) * 8], pad_ranks)
            for s in range(Sl)
        ]
        rn0 = [aux_ref[s * 8, 0] for s in range(Sl)]
        done_at = [aux_ref[s * 8, 1] for s in range(Sl)]
        base_t = aux_ref[0, 2]
        rn_last = [aux_ref[s * 8, 3] for s in range(Sl)]

        for t in range(T):
            j = t % M
            if t >= M:
                for s in range(Sl):
                    for c in range(C):
                        send_desc(s, c, j).wait_send()
                        ack_wait_desc(s, c, j).wait_recv()
            for s in range(Sl):
                for c in range(C):
                    fs = flat(j, s, c)
                    pk = jnp.dot(
                        OH_sc[s][c], xx[s],
                        preferred_element_type=jnp.float32,
                    )
                    send[fs, :SEG] = pk
                    send[fs, SEG:] = kn[s]
                    send_desc(s, c, j).start()
            msgs = [[None] * C for _ in range(Sl)]
            inflags = [None] * Sl
            if t >= B:
                jc = (t - B) % M
                for s in range(Sl):
                    fl = jnp.zeros((8, 128), jnp.float32)
                    for c in range(C):
                        fs = flat(jc, s, c)
                        recv_wait_desc(s, c, jc).wait_recv()
                        msgs[s][c] = recv[fs, :SEG]
                        fl = jnp.maximum(fl, recv[fs, SEG:])
                        if t - M >= B:
                            ack_desc(s, c, jc).wait_send()
                        ack_desc(s, c, jc).start()
                    inflags[s] = fl
            else:
                for s in range(Sl):
                    for c in range(C):
                        msgs[s][c] = carry_ref[
                            (s * C + c) * SEG:(s * C + c + 1) * SEG
                        ]
                    inflags[s] = jnp.zeros((8, 128), jnp.float32)
            for s in range(Sl):
                halo = jnp.dot(
                    U_sc[s][0], msgs[s][0],
                    preferred_element_type=jnp.float32,
                )
                for c in range(1, C):
                    halo = halo + jnp.dot(
                        U_sc[s][c], msgs[s][c],
                        preferred_element_type=jnp.float32,
                    )
                x_ext = jnp.concatenate([xx[s], halo], axis=0)
                r = md_s[s] * (
                    b_s[s] - jnp.dot(
                        A_s[s], x_ext, preferred_element_type=jnp.float32,
                        precision=A_PREC,
                    )
                )
                rn = dot(mi_s[s] * r, mi_s[s] * r)[0, 0]
                rn_last[s] = rn
                rn0[s] = jnp.where(rn0[s] < 0, rn, rn0[s])
                myconv = jnp.where(rn <= tol2 * rn0[s], 1.0, 0.0)
                mylane = me * jnp.int32(Sl) + jnp.int32(s)
                mybit = jnp.where(lane8 == mylane, myconv, 0.0)
                kn_new = jnp.maximum(jnp.maximum(kn[s], mybit), inflags[s])
                all_known = jnp.sum(
                    jnp.sum(kn_new[0:1, :], axis=1, keepdims=True),
                    axis=0, keepdims=True,
                )[0, 0] >= 128.0
                frozen = (done_at[s] >= 0) | all_known
                z = local_correct(s, r)
                x_new = xx[s] + z[:Rint]
                xx[s] = jnp.where(frozen, xx[s], x_new)
                kn[s] = kn_new
                done_at[s] = jnp.where(
                    done_at[s] >= 0, done_at[s],
                    jnp.where(all_known, base_t + jnp.float32(t), -1.0),
                )

        # ---- static drains (uniform T rounds; cf. async_ras.py) ----------
        for n in range(max(T - B, 0), T):
            jc = n % M
            for s in range(Sl):
                for c in range(C):
                    fs = flat(jc, s, c)
                    recv_wait_desc(s, c, jc).wait_recv()
                    kn[s] = jnp.maximum(kn[s], recv[fs, SEG:])
        j_last = (T - 1) % M
        for s in range(Sl):
            for c in range(C):
                carry_out[(s * C + c) * SEG:(s * C + c + 1) * SEG] = recv[
                    flat(j_last, s, c), :SEG
                ]
        for n in range(max(T - M, 0), max(T - B, 0)):
            for s in range(Sl):
                for c in range(C):
                    ack_wait_desc(s, c, n % M).wait_recv()
        for t in range(max(T - M, 0), T):
            for s in range(Sl):
                for c in range(C):
                    send_desc(s, c, t % M).wait_send()
        for n in range(max(T - B - M, 0), max(T - B, 0)):
            for s in range(Sl):
                for c in range(C):
                    ack_desc(s, c, n % M).wait_send()

        for s in range(Sl):
            x_out[s * Rint:(s + 1) * Rint] = xx[s]
            known_out[s * 8:(s + 1) * 8] = kn[s]
            lane = lane8
            av = jnp.where(lane == 0, rn0[s], 0.0)
            av = jnp.where(lane == 1, done_at[s], av)
            av = jnp.where(lane == 2, base_t + jnp.float32(T), av)
            av = jnp.where(lane == 3, rn_last[s], av)
            aux_out[s * 8:(s + 1) * 8] = av

    with jax.enable_x64(False):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
        smem = pl.BlockSpec(memory_space=pltpu.SMEM)
        args = (A, b, dinv, mdom, mint, OH, U, tgt_dev, tgt_sl,
                x, known, aux, carry)
        if use_oras:
            args = args + (boost,)
        x_o, known_o, aux_o, carry_o = pl.pallas_call(
            kernel,
            in_specs=([vmem] * 7 + [smem, smem] + [vmem] * 4
                      + ([vmem] if use_oras else [])),
            out_specs=(vmem,) * 4,
            out_shape=(
                jax.ShapeDtypeStruct((Sl * Rint, 128), jnp.float32),
                jax.ShapeDtypeStruct((Sl * 8, 128), jnp.float32),
                jax.ShapeDtypeStruct((Sl * 8, 128), jnp.float32),
                jax.ShapeDtypeStruct((Sl * C * SEG, 128), jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((M * L, MSG, 128), jnp.float32),   # send
                pltpu.VMEM((M * L, MSG, 128), jnp.float32),   # recv
                pltpu.VMEM((8, 128), jnp.float32),            # ack payload
                pltpu.VMEM((M * L, 8, 128), jnp.float32),     # ack arrivals
                pltpu.SemaphoreType.DMA((M * L,)),            # ssem
                pltpu.SemaphoreType.DMA((M * L,)),            # rsem
                pltpu.SemaphoreType.DMA((M * L,)),            # asem
                pltpu.SemaphoreType.DMA((M * L,)),            # arsem
            ],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(*args)
    return x_o, known_o, aux_o, carry_o


class AsyncGeneralRASolver:
    """Host driver for the general-graph free-running kernel.

    Same chunked-launch surface as ops.async_ras.AsyncRASolver; works on
    any matrix/partition pair.  ``part=None`` uses regular 1-D blocks.
    """

    def __init__(self, mat, rhs, num_subdomains: int, overlap: int = 2,
                 tolerance: float = 1e-6, staleness: int = 1,
                 ninner: int = 12, chunk_rounds: int = 16,
                 part=None, mesh=None, interpret: Optional[bool] = None,
                 vmem_budget: int = 14 << 20, oras_weight: float = 0.0,
                 nonsym: bool = False, mxu_precision: str = "auto"):
        from jax.sharding import PartitionSpec as P

        from schwarz_tpu.core.partition import partition_regular_1d
        from schwarz_tpu.parallel.mesh import SUBD_AXIS, make_mesh

        S = num_subdomains
        if part is None:
            part = partition_regular_1d(mat.n, S)
        self.plan = build_general_plan(mat, rhs, part, overlap,
                                       oras_weight=oras_weight)
        self.oras_weight = float(oras_weight)
        self.nonsym = bool(nonsym)
        if self.plan.S != S:
            raise ValueError(
                f"partition has {self.plan.S} parts, expected {S}"
            )
        self.mat = mat
        self.rhs = np.asarray(rhs)
        self.tolerance = tolerance
        self.staleness = staleness
        self.chunk_rounds = chunk_rounds
        if mesh is None:
            avail = len(jax.devices())
            D = (S if S <= avail else
                 max(d for d in range(1, min(avail, S) + 1) if S % d == 0))
            mesh = make_mesh(jax.devices()[:D])
        D = int(mesh.devices.size)
        if S % D:
            raise ValueError(
                f"free-running mode requires S ({S}) % devices ({D}) == 0"
            )
        self.D, self.Sl, self.mesh = D, S // D, mesh
        if interpret is None:
            interpret = mesh.devices.reshape(-1)[0].platform == "cpu"
        self.interpret = interpret
        if not interpret:
            est = vmem_estimate_bytes(self.plan, self.Sl, staleness)
            if est > vmem_budget:
                raise NotImplementedFeature(
                    f"general free-running instance needs ~{est >> 20} MiB "
                    f"VMEM (> {vmem_budget >> 20} MiB): use fewer folded "
                    "ranks per device, smaller subdomains, or the "
                    "bounded-staleness emulation"
                )
        # f32-accurate MXU passes on the A-dots when the extra operand-
        # splitting stack fits (see async_general_rounds); at the DEFAULT
        # bf16 precision the in-band residual floors near 1e-1 and the
        # refinement restarts (run_refined) are the accuracy recipe
        if mxu_precision not in ("auto", "highest", "default"):
            raise ValueError(
                f"mxu_precision must be auto/highest/default, got "
                f"{mxu_precision!r}"
            )
        if mxu_precision == "auto":
            if interpret:
                mxu_precision = "default"   # interpret computes exact f32
            else:
                est = vmem_estimate_bytes(self.plan, self.Sl, staleness)
                emul = 2 * self.Sl * self.plan.Rext * self.plan.Rext * 4
                mxu_precision = (
                    "highest" if est + emul <= vmem_budget else "default"
                )
        self.mxu_precision = mxu_precision

        p = self.plan
        kern = functools.partial(
            async_general_rounds,
            Rint=p.Rint, Rext=p.Rext, H=p.H, SEG=p.SEG, C=p.C, Sl=self.Sl,
            rounds=chunk_rounds, staleness=staleness, ninner=ninner,
            tol=tolerance, n_ranks=S, axis_name=SUBD_AXIS,
            interpret=interpret, nonsym=nonsym,
            mxu_precision=self.mxu_precision,
        )
        spec = P(SUBD_AXIS)
        n_in = 14 if p.boost is not None else 13
        self._mapped = jax.jit(jax.shard_map(
            kern, mesh=mesh, in_specs=(spec,) * n_in,
            out_specs=(spec,) * 4, check_vma=False,
        ))
        shard = self._shard = jax.sharding.NamedSharding(mesh, spec)
        lane_rep = _lane_rep
        tgt_dev = (p.tgt_subd // self.Sl).astype(np.int32)
        tgt_sl = (p.tgt_subd % self.Sl).astype(np.int32)
        self._dev = {
            "A": jax.device_put(jnp.asarray(p.A), shard),
            "b": jax.device_put(jnp.asarray(lane_rep(p.b)), shard),
            "dinv": jax.device_put(jnp.asarray(lane_rep(p.dinv)), shard),
            "mdom": jax.device_put(
                jnp.asarray(lane_rep(p.mask_dom)), shard),
            "mint": jax.device_put(
                jnp.asarray(lane_rep(p.mask_int)), shard),
            "OH": jax.device_put(
                jnp.asarray(p.OH.reshape(-1, p.Rint)), shard),
            "U": jax.device_put(jnp.asarray(p.U.reshape(-1, p.SEG)), shard),
            "td": jax.device_put(jnp.asarray(tgt_dev), shard),
            "ts": jax.device_put(jnp.asarray(tgt_sl), shard),
        }
        if p.boost is not None:
            self._dev["boost"] = jax.device_put(
                jnp.asarray(lane_rep(p.boost)), shard
            )

    def set_rhs(self, rhs) -> None:
        """Repack the per-rank RHS slots without rebuilding the plan
        (restarts reuse the dense operators, link tables, jitted kernel)."""
        p = self.plan
        r = np.asarray(rhs, np.float64)
        b = (p.mask_dom * r[np.clip(p.gid, 0, p.N - 1)]).astype(np.float32)
        p.b = b
        self.rhs = np.asarray(rhs)
        self._dev["b"] = jax.device_put(
            jnp.asarray(_lane_rep(b)), self._shard
        )

    def run_refined(self, tol: float = 1e-10, max_restarts: int = 12,
                    max_rounds: int = 400, resume_state=None,
                    checkpoint_path: Optional[str] = None,
                    coarse_q: int = 0, coarse_subdomains=None):
        """f64-accurate solve via iterative-refinement restarts of the
        f32 kernel (ops.async_ras.iterative_refinement_run); ``coarse_q``
        > 0 adds spectral coarse corrections at the restarts."""
        from schwarz_tpu.ops.async_ras import iterative_refinement_run

        return iterative_refinement_run(
            self, tol=tol, max_restarts=max_restarts,
            max_rounds=max_rounds, resume_state=resume_state,
            checkpoint_path=checkpoint_path, coarse_q=coarse_q,
            coarse_subdomains=coarse_subdomains,
        )

    def save_checkpoint(self, state, path: str) -> None:
        """Persist a free-running state (x, known, aux, carry)."""
        np.savez_compressed(path, *[np.asarray(a) for a in state])

    def load_checkpoint(self, path: str):
        import os

        # np.savez_compressed appends .npz to a suffix-less path; accept
        # the same path back (save/load symmetry)
        if not os.path.exists(path) and os.path.exists(path + ".npz"):
            path = path + ".npz"
        data = np.load(path)
        return tuple(jnp.asarray(data[f"arr_{i}"]) for i in range(4))

    def run(self, max_rounds: int = 400, resume_state=None,
            checkpoint_path: Optional[str] = None):
        """Chunked launches until every rank detects global convergence."""
        import time

        p = self.plan
        S, D = p.S, self.D
        if resume_state is not None:
            x, known, aux, carry = resume_state
        else:
            x = jnp.zeros((S * p.Rint, 128), jnp.float32)
            known = jnp.zeros((S * 8, 128), jnp.float32)
            aux = np.full((S * 8, 128), -1.0, np.float32)
            aux[:, 2] = 0.0
            aux = jnp.asarray(aux)
            carry = jnp.zeros((S * p.C * p.SEG, 128), jnp.float32)
        t0 = time.perf_counter()
        rounds = 0
        extra = ((self._dev["boost"],) if "boost" in self._dev else ())
        while rounds < max_rounds:
            x, known, aux, carry = self._mapped(
                self._dev["A"], self._dev["b"], self._dev["dinv"],
                self._dev["mdom"], self._dev["mint"], self._dev["OH"],
                self._dev["U"], self._dev["td"], self._dev["ts"],
                x, known, aux, carry, *extra,
            )
            rounds += self.chunk_rounds
            done = np.asarray(aux[::8, 1])
            if np.all(done >= 0):
                break
        elapsed = time.perf_counter() - t0
        if checkpoint_path is not None:
            self.save_checkpoint((x, known, aux, carry), checkpoint_path)
        x_h = np.asarray(jax.block_until_ready(x))[:, 0].reshape(S, p.Rint)
        sol = np.zeros(p.N, np.float32)
        for s in range(S):
            sol[p.int_ids[s]] = x_h[s, : p.n_int[s]]
        A_sp = self.mat.to_scipy()
        res = self.rhs - A_sp @ sol
        rel = float(
            np.linalg.norm(res) / max(np.linalg.norm(self.rhs), 1e-300)
        )
        done = np.asarray(aux[::8, 1]).astype(int)
        total_rounds = int(np.asarray(aux[0, 2]))
        msg_bytes = (p.SEG + 8) * 128 * 4
        return sol, {
            "done_at": done,
            "converged": bool(np.all(done >= 0)),
            "rounds": rounds,
            "total_rounds": total_rounds,
            "colors": p.C,
            "comm_bytes_per_rank": total_rounds * p.C * (
                msg_bytes + 8 * 128 * 4
            ),
            "relative_residual_norm": rel,
            "time_s": elapsed,
        }
