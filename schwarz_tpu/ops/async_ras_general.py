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
- **Dense local operators, HBM-streamed** (round-5): each rank's extended
  system (interior + overlap closure + one Dirichlet frontier ring) is
  densified at setup and SYMMETRICALLY JACOBI-SCALED (global
  |diag A|^{-1/2}, so the scaled diagonal is +-1 and bf16 MXU products
  keep their relative accuracy on anisotropic operators); the local solve
  is ``ninner`` Jacobi-PCG iterations whose matvec is one
  (Rext, Rext) @ (Rext, 128) MXU matmul.  The operators and one-hot
  tables live in HBM and are double-buffered into VMEM per rank per
  round (``make_async_copy``, prefetching rank k+1 behind rank k's
  matvecs), so VMEM holds ONE rank's working set, not ``Sl`` of them —
  ani4-class metis instances (8 folded ranks, Rext 896) run natively on
  one chip.  Tables are bf16 at DEFAULT MXU precision (lossless there)
  or f32 at HIGHEST when the estimator says they fit; messages and the
  state stay f32.  A calibrated VMEM estimate plus an sflag (semaphore
  space) count gate oversized instances with an actionable error.
- **Accuracy recipe**: at the bf16 floor the one-level in-band iteration
  stalls on ill-conditioned instances; ``run_refined(coarse_q > 0)``
  (host f64 iterative refinement + spectral coarse corrections at the
  restart points) is the production path — measured on v5e: ani4/metis/8
  ranks converges to 8.9e-9 true relative residual in 25 restarts.

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
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from schwarz_tpu.exceptions import NotImplementedFeature


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


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
    scale: np.ndarray = None  # (N,) f64 symmetric Jacobi scale d^{-1/2}
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

    # Symmetric Jacobi scaling (global, so every rank scales a shared row
    # identically): the kernel solves  (Ds A Ds) y = Ds b  with
    # Ds = diag(|diag A|^{-1/2}) and x = Ds y recovered at extraction.
    # The scaled diagonal is +-1, compressing the dynamic range of every
    # MXU product — without it the bf16 table mode (mandatory at ani4
    # scale, where f32 tables exceed the 16 MiB VMEM) cannot make
    # progress on anisotropic operators.
    dg = A_sp.diagonal()
    with np.errstate(divide="ignore"):
        dscale = np.where(dg != 0, 1.0 / np.sqrt(np.abs(dg)), 1.0)

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
    # 128-multiples: the streamed tables' minor dims (Rext for A, Rint for
    # OH) must be whole (8, 128) tiles — Mosaic rejects DMA slices whose
    # minor dim is not 128-aligned
    Rint = _round_up(int(n_int.max()), 128)
    H = _round_up(int(n_halo.max()), 128)
    Rext = Rint + H
    seg_max = 1
    for s in range(S):
        for o, ids in halo_by_owner[s].items():
            if o != s:
                seg_max = max(seg_max, ids.size)
    # 128-multiple so messages lane-pack into whole (8, 128) tiles
    SEG = _round_up(seg_max, 128)

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
                    A[s, i, j] = v * dscale[g] * dscale[gc]
                b[s, i] = rhs_np[g] * dscale[g]
                d = A[s, i, i]
                dinv[s, i] = 1.0 / d if d != 0 else 1.0
                mask_dom[s, i] = 1.0
            # off-domain (frontier) and padding rows stay ZERO: with
            # b = 0 and zero A-rows there, the residual and every CG
            # direction vanish on those slots — mask_dom never needs to
            # ship to the kernel (it remains a host-side plan field)
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
        tgt_subd=tgt_subd, send_len=send_len, gid=gid, scale=dscale,
        boost=boost,
    )


def sflag_count(p: GeneralAsyncPlan, Sl: int, staleness: int) -> int:
    """DMA semaphores the kernel allocates (v5e sflag space: 2 KiB = 512).

    Message arrivals are per ring slot (M*L); send completions and ack
    credits are per-link counting semaphores (L each); +2 table-stream
    slots."""
    M = 2 * max(staleness, 1) + 2
    L = Sl * p.C
    return M * L + 3 * L + 2


def vmem_estimate_bytes(p: GeneralAsyncPlan, Sl: int, staleness: int,
                        tbl_bytes: int = 2) -> int:
    """Rough per-device VMEM footprint of the streaming kernel.

    The round-5 kernel keeps the dense extended operators and one-hot
    tables HBM-RESIDENT and double-buffers ONE rank's working set into
    VMEM per round (Pallas ``make_async_copy``), so the footprint scales
    with the largest single rank, not with ``Sl * Rext**2`` — the change
    that lets ani4-class metis instances (8 folded ranks) run natively
    on one chip.  ``tbl_bytes`` is 2 for bf16 table storage (the MXU's
    DEFAULT precision already truncates operands to bf16 per pass, so
    bf16 storage loses nothing in that mode) or 4 for f32 (HIGHEST)."""
    M = 2 * max(staleness, 1) + 2
    SEGT = p.SEG // 128
    MSGC = 8 * SEGT + 8
    L = Sl * p.C
    NB = -(-p.Rext // 128)
    NV = 4 if p.boost is not None else 3   # b, dinv, mask_int[, boost]
    # double-buffered table scratch (2 slots)
    buf = 2 * (p.Rext * p.Rext + p.C * p.SEG * p.Rint
               + p.C * p.H * p.SEG) * tbl_bytes
    buf += 2 * NV * NB * 8 * 128 * 4          # lane-packed vectors (f32)
    rings = 2 * M * L * MSGC * 128 * 4        # lane-packed send + recv
    rings += 2 * 8 * 128 * 4                  # shared ack payload + landing
    state = 2 * (Sl * p.Rint + 2 * Sl * 8
                 + Sl * p.C * 8 * SEGT) * 128 * 4   # x/known/aux/carry in+out
    # stack calibrated against Mosaic's scoped-VMEM accounting (v5e cap
    # 16 MiB): ani4/bf16 estimates 15.3 MiB and compiles; ani4/f32-HIGHEST
    # estimates 27 MiB vs Mosaic's measured 29.67 MiB demand.  Mosaic
    # folds table-ref reads into dot operands, so the A value itself is
    # not double-counted; HIGHEST adds operand-splitting copies.
    stack = 6 * p.Rext * 128 * 4              # x_ext, r, CG temps
    if tbl_bytes == 4:
        stack += 2 * p.Rext * p.Rext * 4      # HIGHEST operand splitting
    return buf + rings + state + stack


@functools.partial(
    jax.jit,
    static_argnames=(
        "Rint", "Rext", "H", "SEG", "C", "Sl", "rounds", "staleness",
        "ninner", "tol", "n_ranks", "axis_name", "interpret", "nonsym",
        "mxu_precision",
    ),
)
def async_general_rounds(
    A, vec, OH, U, tgt_dev, tgt_sl, x, known, aux, carry,
    *,
    Rint: int, Rext: int, H: int, SEG: int, C: int, Sl: int,
    rounds: int, staleness: int, ninner: int, tol: float,
    n_ranks: int, axis_name: str, interpret: bool, nonsym: bool = False,
    mxu_precision: str = "default",
):
    """Run ``rounds`` free-running iterations of every rank on this device.

    Streaming layout (round-5; the all-VMEM v1 capped folded instances at
    ~14 MiB of dense operators):

      - ``A`` (Sl, Rext, Rext), ``OH`` (Sl, C*SEG, Rint), ``U``
        (Sl, C*H, SEG) live in HBM (``pl.ANY``) in the kernel's table
        dtype (bf16 at DEFAULT MXU precision — lossless there — or f32
        at HIGHEST) and are double-buffered into VMEM per rank per round
        with leading-dim ``make_async_copy`` DMAs, prefetching rank k+1
        while rank k computes.  HBM re-read traffic is hidden behind the
        rank's ninner MXU matvecs.
      - ``vec`` (Sl, NV*NB*8, 128) carries b/dinv/mask_dom/mask_int
        [/boost] LANE-PACKED (value i at row 8*(v*NB + i//128), lane
        i%128); the kernel re-expands them to lane-replicated (Rext, 128)
        tiles with one outer-product + transpose per 128-block.
      - messages are lane-packed: the (SEG, 128) lane-replicated pack
        result compresses to ``8*SEGT`` rows (diagonal extraction), so a
        ring slot is ``8*SEGT + 8`` rows instead of ``SEG + 8`` — 16x
        less ring VMEM at SEG <= 128.  Receivers re-expand with the same
        transpose trick.  ``carry`` holds compact messages.
      - all acks land in ONE shared (8, 128) tile (the payload is never
        read — only the per-link recv semaphores carry information).

    The message protocol (slot rings, ack credits, bounded staleness B,
    warm-up carry, uniform static drains, in-band gossip) is unchanged
    from v1 / ops/async_ras.py.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = max(staleness, 1)
    M = 2 * B + 2
    T = rounds
    SEGT = SEG // 128
    MSGC = 8 * SEGT + 8
    L = Sl * C
    NB = -(-Rext // 128)
    NV = int(vec.shape[-2]) // (NB * 8)
    use_oras = NV >= 4
    tbl_dtype = A.dtype
    tol2 = float(tol) * float(tol)
    # HIGHEST forces f32-accurate MXU passes on the A-dots; with bf16
    # tables the operands are already bf16 and the flag is moot
    A_PREC = (jax.lax.Precision.HIGHEST
              if (mxu_precision == "highest" and tbl_dtype == jnp.float32)
              else None)

    def kernel(*refs):
        (A_ref, vec_ref, OH_ref, U_ref, td_ref, ts_ref,
         x_ref, known_ref, aux_ref, carry_ref) = refs[:10]
        (x_out, known_out, aux_out, carry_out) = refs[10:14]
        (A_buf, OH_buf, U_buf, vec_buf, send, recv, ackpay, ackbuf,
         tsem, ssem, rsem, asem, arsem) = refs[14:]
        me = jax.lax.axis_index(axis_name)
        devty = pltpu.DeviceIdType.LOGICAL
        f32 = jnp.float32

        def cast(v):
            return v.astype(tbl_dtype) if tbl_dtype != f32 else v

        def flat(j, s, c):
            return (j * Sl + s) * C + c

        # Semaphore economy (v5e has 2 KiB of sflag space = 512
        # semaphores; the v1 per-(slot, link) allocation of all four
        # arrays blew it at ani4 scale): only message ARRIVALS need a
        # per-ring-slot semaphore (the consumer must know the specific
        # slot's data landed).  Send completions and ack credits are pure
        # COUNTS — equal-sized transfers on one link consumed one per
        # round — so ssem/asem/arsem are per-LINK counting semaphores.
        # Slot-reuse safety for sends comes from the ack protocol: the
        # partner's ack for message t-M proves that send left our slot.
        def link(s, c):
            return s * C + c

        def send_desc(s, c, j):
            fs = flat(j, s, c)
            td = td_ref[s, c]
            fd = (j * Sl + ts_ref[s, c]) * C + c
            return pltpu.make_async_remote_copy(
                src_ref=send.at[fs], dst_ref=recv.at[fd],
                send_sem=ssem.at[link(s, c)], recv_sem=rsem.at[fd],
                device_id=td, device_id_type=devty,
            )

        def recv_wait_desc(s, c, j):
            # arrival waits touch only (recv_sem, dst size): build a
            # self-shaped descriptor for OUR slot (the sender signalled it)
            fs = flat(j, s, c)
            return pltpu.make_async_remote_copy(
                src_ref=send.at[fs], dst_ref=recv.at[fs],
                send_sem=ssem.at[link(s, c)], recv_sem=rsem.at[fs],
                device_id=me, device_id_type=devty,
            )

        def ack_desc(s, c, j):
            # credit the partner for the message in OUR slot (j, s, c);
            # every ack lands in the shared tile — only the semaphore
            # (the partner's per-link credit count) carries meaning
            td = td_ref[s, c]
            fd = ts_ref[s, c] * C + c
            return pltpu.make_async_remote_copy(
                src_ref=ackpay, dst_ref=ackbuf,
                send_sem=asem.at[link(s, c)], recv_sem=arsem.at[fd],
                device_id=td, device_id_type=devty,
            )

        def ack_wait_desc(s, c, j):
            return pltpu.make_async_remote_copy(
                src_ref=ackpay, dst_ref=ackbuf,
                send_sem=asem.at[link(s, c)], recv_sem=arsem.at[link(s, c)],
                device_id=me, device_id_type=devty,
            )

        def tbl_dmas(s, slot):
            return (
                pltpu.make_async_copy(A_ref.at[s], A_buf.at[slot],
                                      tsem.at[slot]),
                pltpu.make_async_copy(OH_ref.at[s], OH_buf.at[slot],
                                      tsem.at[slot]),
                pltpu.make_async_copy(U_ref.at[s], U_buf.at[slot],
                                      tsem.at[slot]),
                pltpu.make_async_copy(vec_ref.at[s], vec_buf.at[slot],
                                      tsem.at[slot]),
            )

        def start_tbl(s, slot):
            for d in tbl_dmas(s, slot):
                d.start()

        def wait_tbl(s, slot):
            for d in tbl_dmas(s, slot):
                d.wait()

        ackpay[:] = jnp.zeros((8, 128), f32)

        lane8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        pad_ranks = jnp.where(lane8 >= n_ranks, 1.0, 0.0)
        eye128 = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1),
            1.0, 0.0,
        ).astype(f32)
        ones_col = jnp.ones((128, 1), f32)

        def compact_msg(pk):
            """(SEG, 128) lane-replicated -> (8*SEGT, 128) compact."""
            outs = []
            for t2 in range(SEGT):
                blk = pk[t2 * 128:(t2 + 1) * 128]
                v = jnp.sum(blk * eye128, axis=0, keepdims=True)
                outs.append(jnp.concatenate(
                    [v, jnp.zeros((7, 128), f32)], 0))
            return outs[0] if SEGT == 1 else jnp.concatenate(outs, 0)

        def lane_expand(row):
            """(1, 128) lane vector -> (128, 128) sublane-replicated.

            Pure data movement (broadcast + transpose unit) — an MXU
            outer-product here would truncate the f32 values to bf16 at
            DEFAULT precision."""
            return jnp.transpose(jnp.broadcast_to(row, (128, 128)))

        def expand_msg(comp):
            """(8*SEGT, 128) compact -> (SEG, 128) lane-replicated."""
            outs = [lane_expand(comp[t2 * 8:t2 * 8 + 1])
                    for t2 in range(SEGT)]
            return outs[0] if SEGT == 1 else jnp.concatenate(outs, 0)

        def expand_vec(vb, vi):
            """Lane-packed vector vi -> (Rext, 128) lane-replicated."""
            blocks = [lane_expand(vb[(vi * NB + kb) * 8:
                                     (vi * NB + kb) * 8 + 1])
                      for kb in range(NB)]
            full = blocks[0] if NB == 1 else jnp.concatenate(blocks, 0)
            return full[:Rext]

        def dot(u, v):
            t1 = jnp.sum(u * v, axis=1, keepdims=True)
            return jnp.sum(t1, axis=0, keepdims=True)

        # working state lives in the OUTPUT refs across the round loop
        x_out[:] = x_ref[:]
        known_out[:] = jnp.maximum(
            known_ref[:],
            jnp.tile(pad_ranks, (Sl, 1)) if Sl > 1 else pad_ranks,
        )
        aux_out[:] = aux_ref[:]
        base_t = aux_ref[0, 2]

        def rank_round(t, s, slot):
            j = t % M
            wait_tbl(s, slot)
            k = t * Sl + s
            if k + 1 < T * Sl:
                start_tbl((s + 1) % Sl, (k + 1) % 2)
            if t >= M:
                for c in range(C):
                    send_desc(s, c, j).wait_send()
                    ack_wait_desc(s, c, j).wait_recv()
            xx = x_out[s * Rint:(s + 1) * Rint]
            kn = known_out[s * 8:(s + 1) * 8]
            OH_v = OH_buf[slot]
            for c in range(C):
                fs = flat(j, s, c)
                pk = jnp.dot(
                    OH_v[c * SEG:(c + 1) * SEG], cast(xx),
                    preferred_element_type=f32, precision=A_PREC,
                )
                send[fs, :8 * SEGT] = compact_msg(pk)
                send[fs, 8 * SEGT:] = kn
                send_desc(s, c, j).start()
            comps = [None] * C
            inflags = jnp.zeros((8, 128), f32)
            if t >= B:
                jc = (t - B) % M
                for c in range(C):
                    fs = flat(jc, s, c)
                    recv_wait_desc(s, c, jc).wait_recv()
                    comps[c] = recv[fs, :8 * SEGT]
                    inflags = jnp.maximum(inflags, recv[fs, 8 * SEGT:])
                    if t - M >= B:
                        ack_desc(s, c, jc).wait_send()
                    ack_desc(s, c, jc).start()
            else:
                for c in range(C):
                    comps[c] = carry_ref[
                        (s * C + c) * 8 * SEGT:(s * C + c + 1) * 8 * SEGT
                    ]
            U_v = U_buf[slot]
            halo = jnp.dot(
                U_v[:H], cast(expand_msg(comps[0])),
                preferred_element_type=f32, precision=A_PREC,
            )
            for c in range(1, C):
                halo = halo + jnp.dot(
                    U_v[c * H:(c + 1) * H], cast(expand_msg(comps[c])),
                    preferred_element_type=f32, precision=A_PREC,
                )
            x_ext = jnp.concatenate([xx, halo], axis=0)
            A_v = A_buf[slot]
            vb = vec_buf[slot]
            b_v = expand_vec(vb, 0)
            dv = expand_vec(vb, 1)
            mi = expand_vec(vb, 2)
            bo = expand_vec(vb, 3) if use_oras else None

            def apply_solve(v):
                # O-RAS Robin diagonal on the solve operator only; the
                # residual keeps the true A (fixed point unchanged).  No
                # domain mask: off-domain rows of A are built ZERO, so
                # products and residuals vanish there by construction.
                av = jnp.dot(
                    A_v, cast(v), preferred_element_type=f32,
                    precision=A_PREC,
                )
                if use_oras:
                    av = av + bo * v
                return av

            r = b_v - jnp.dot(
                A_v, cast(x_ext), preferred_element_type=f32,
                precision=A_PREC,
            )
            rn = dot(mi * r, mi * r)[0, 0]
            rn0 = aux_out[s * 8, 0]
            done_at = aux_out[s * 8, 1]
            rn0 = jnp.where(rn0 < 0, rn, rn0)
            myconv = jnp.where(rn <= tol2 * rn0, 1.0, 0.0)
            mylane = me * jnp.int32(Sl) + jnp.int32(s)
            mybit = jnp.where(lane8 == mylane, myconv, 0.0)
            kn_new = jnp.maximum(jnp.maximum(kn, mybit), inflags)
            all_known = jnp.sum(
                jnp.sum(kn_new[0:1, :], axis=1, keepdims=True),
                axis=0, keepdims=True,
            )[0, 0] >= 128.0
            frozen = (done_at >= 0) | all_known

            if nonsym:
                from schwarz_tpu.ops.async_ras import _bicgstab_correction

                z = _bicgstab_correction(apply_solve, dot, dv, r, ninner)
            else:
                eps = jnp.finfo(f32).tiny
                z0 = jnp.zeros_like(r)
                s0 = dv * r
                rho0 = dot(r, s0)

                def body(_, cstate):
                    zz, rr_, pp, rho = cstate
                    ap = apply_solve(pp)
                    pap = dot(pp, ap)
                    alpha = jnp.where(
                        pap > 0, rho / jnp.maximum(pap, eps), 0.0)
                    zz = zz + alpha * pp
                    rr_ = rr_ - alpha * ap
                    sn = dv * rr_
                    rho_n = dot(rr_, sn)
                    beta = jnp.where(
                        rho > 0, rho_n / jnp.maximum(rho, eps), 0.0)
                    return zz, rr_, sn + beta * pp, rho_n

                z, _, _, _ = jax.lax.fori_loop(
                    0, ninner, body, (z0, r, s0, rho0)
                )

            x_out[s * Rint:(s + 1) * Rint] = jnp.where(
                frozen, xx, xx + z[:Rint])
            known_out[s * 8:(s + 1) * 8] = kn_new
            done_new = jnp.where(
                done_at >= 0, done_at,
                jnp.where(all_known, base_t + jnp.float32(t), -1.0),
            )
            av = aux_out[s * 8:(s + 1) * 8]
            av = jnp.where(lane8 == 0, rn0, av)
            av = jnp.where(lane8 == 1, done_new, av)
            av = jnp.where(lane8 == 2, base_t + jnp.float32(T), av)
            av = jnp.where(lane8 == 3, rn, av)   # last local ||r||^2
            aux_out[s * 8:(s + 1) * 8] = av

        start_tbl(0, 0)
        for t in range(T):
            for s in range(Sl):
                rank_round(t, s, (t * Sl + s) % 2)

        # ---- static drains (uniform T rounds; cf. async_ras.py) ----------
        for n in range(max(T - B, 0), T):
            jc = n % M
            for s in range(Sl):
                for c in range(C):
                    fs = flat(jc, s, c)
                    recv_wait_desc(s, c, jc).wait_recv()
                    known_out[s * 8:(s + 1) * 8] = jnp.maximum(
                        known_out[s * 8:(s + 1) * 8], recv[fs, 8 * SEGT:])
        j_last = (T - 1) % M
        for s in range(Sl):
            for c in range(C):
                carry_out[
                    (s * C + c) * 8 * SEGT:(s * C + c + 1) * 8 * SEGT
                ] = recv[flat(j_last, s, c), :8 * SEGT]
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

    with jax.enable_x64(False):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        anymem = pl.BlockSpec(memory_space=pl.ANY)
        vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
        smem = pl.BlockSpec(memory_space=pltpu.SMEM)
        args = (A, vec, OH, U, tgt_dev, tgt_sl, x, known, aux, carry)
        x_o, known_o, aux_o, carry_o = pl.pallas_call(
            kernel,
            in_specs=[anymem] * 4 + [smem, smem] + [vmem] * 4,
            out_specs=(vmem,) * 4,
            out_shape=(
                jax.ShapeDtypeStruct((Sl * Rint, 128), jnp.float32),
                jax.ShapeDtypeStruct((Sl * 8, 128), jnp.float32),
                jax.ShapeDtypeStruct((Sl * 8, 128), jnp.float32),
                jax.ShapeDtypeStruct((Sl * C * 8 * SEGT, 128),
                                     jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((2, Rext, Rext), tbl_dtype),     # A double-buf
                pltpu.VMEM((2, C * SEG, Rint), tbl_dtype),  # OH double-buf
                pltpu.VMEM((2, C * H, SEG), tbl_dtype),     # U double-buf
                pltpu.VMEM((2, NV * NB * 8, 128), jnp.float32),  # vecs
                pltpu.VMEM((M * L, MSGC, 128), jnp.float32),     # send
                pltpu.VMEM((M * L, MSGC, 128), jnp.float32),     # recv
                pltpu.VMEM((8, 128), jnp.float32),          # ack payload
                pltpu.VMEM((8, 128), jnp.float32),          # shared ack dst
                pltpu.SemaphoreType.DMA((2,)),              # tsem
                pltpu.SemaphoreType.DMA((L,)),              # ssem (counting)
                pltpu.SemaphoreType.DMA((M * L,)),          # rsem (per slot)
                pltpu.SemaphoreType.DMA((L,)),              # asem (counting)
                pltpu.SemaphoreType.DMA((L,)),              # arsem (counting)
            ],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(*args)
    return x_o, known_o, aux_o, carry_o


def pack_plan_vectors(p: GeneralAsyncPlan) -> np.ndarray:
    """Lane-pack b/dinv/mask_int[/boost] into (S, NV*NB*8, 128):
    value i of vector v sits at row 8*(v*NB + i//128), lane i%128."""
    NB = -(-p.Rext // 128)
    vecs = [p.b, p.dinv, p.mask_int]
    if p.boost is not None:
        vecs.append(p.boost)
    NV = len(vecs)
    out = np.zeros((p.S, NV * NB * 8, 128), np.float32)
    for vi, v in enumerate(vecs):
        vp = np.zeros((p.S, NB * 128), np.float32)
        vp[:, :p.Rext] = v
        rows = (vi * NB + np.arange(NB)) * 8
        out[:, rows, :] = vp.reshape(p.S, NB, 128)
    return out


class AsyncGeneralRASolver:
    """Host driver for the general-graph free-running kernel.

    Same chunked-launch surface as ops.async_ras.AsyncRASolver; works on
    any matrix/partition pair.  ``part=None`` uses regular 1-D blocks.
    """

    def __init__(self, mat, rhs, num_subdomains: int, overlap: int = 2,
                 tolerance: float = 1e-6, staleness: int = 1,
                 ninner: int = 12, chunk_rounds: int = 16,
                 part=None, mesh=None, interpret: Optional[bool] = None,
                 vmem_budget: int = 15 << 20, oras_weight: float = 0.0,
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
        if mxu_precision not in ("auto", "highest", "default"):
            raise ValueError(
                f"mxu_precision must be auto/highest/default, got "
                f"{mxu_precision!r}"
            )
        # Table dtype <-> MXU precision (round-5 streaming kernel): bf16
        # tables at DEFAULT precision are lossless there (the MXU already
        # truncates f32 operands to bf16 per pass) and halve the streaming
        # buffers; HIGHEST needs f32 tables + operand-splitting stack.  At
        # the bf16 floor (~1e-1 in-band relative residual) the refinement
        # restarts (run_refined) are the accuracy recipe.  The interpreter
        # computes exact f32 either way.
        if interpret:
            mxu_precision = ("default" if mxu_precision == "auto"
                             else mxu_precision)
            tbl_dtype = np.float32
        else:
            sflags = sflag_count(self.plan, self.Sl, staleness)
            if sflags > 512:
                raise NotImplementedFeature(
                    f"general free-running instance needs {sflags} DMA "
                    "semaphores (> the 512 of v5e sflag space): use fewer "
                    "folded ranks per device, a lower staleness bound, or "
                    "the bounded-staleness emulation"
                )
            est_hi = vmem_estimate_bytes(self.plan, self.Sl, staleness,
                                         tbl_bytes=4)
            est_lo = vmem_estimate_bytes(self.plan, self.Sl, staleness,
                                         tbl_bytes=2)
            if mxu_precision == "auto":
                mxu_precision = ("highest" if est_hi <= vmem_budget
                                 else "default")
            est = est_hi if mxu_precision == "highest" else est_lo
            if est > vmem_budget:
                raise NotImplementedFeature(
                    f"general free-running instance needs ~{est >> 20} MiB "
                    f"VMEM (> {vmem_budget >> 20} MiB) even with HBM-"
                    "streamed tables: use fewer folded ranks per device, "
                    "smaller subdomains, or the bounded-staleness emulation"
                )
            tbl_dtype = (np.float32 if mxu_precision == "highest"
                         else np.dtype("bfloat16"))
        self.mxu_precision = mxu_precision
        self.tbl_dtype = tbl_dtype

        p = self.plan
        self.SEGT = p.SEG // 128
        kern = functools.partial(
            async_general_rounds,
            Rint=p.Rint, Rext=p.Rext, H=p.H, SEG=p.SEG, C=p.C, Sl=self.Sl,
            rounds=chunk_rounds, staleness=staleness, ninner=ninner,
            tol=tolerance, n_ranks=S, axis_name=SUBD_AXIS,
            interpret=interpret, nonsym=nonsym,
            mxu_precision=self.mxu_precision,
        )
        spec = P(SUBD_AXIS)
        self._mapped = jax.jit(jax.shard_map(
            kern, mesh=mesh, in_specs=(spec,) * 10,
            out_specs=(spec,) * 4, check_vma=False,
        ))
        shard = self._shard = jax.sharding.NamedSharding(mesh, spec)
        tgt_dev = (p.tgt_subd // self.Sl).astype(np.int32)
        tgt_sl = (p.tgt_subd % self.Sl).astype(np.int32)
        td = jnp.asarray
        self._dev = {
            "A": jax.device_put(td(p.A.astype(tbl_dtype)), shard),
            "vec": jax.device_put(td(pack_plan_vectors(p)), shard),
            "OH": jax.device_put(
                td(p.OH.reshape(p.S, p.C * p.SEG, p.Rint)
                   .astype(tbl_dtype)), shard),
            "U": jax.device_put(
                td(p.U.reshape(p.S, p.C * p.H, p.SEG)
                   .astype(tbl_dtype)), shard),
            "td": jax.device_put(td(tgt_dev), shard),
            "ts": jax.device_put(td(tgt_sl), shard),
        }

    def set_rhs(self, rhs) -> None:
        """Repack the per-rank RHS slots without rebuilding the plan
        (restarts reuse the streamed operators, link tables, jitted
        kernel)."""
        p = self.plan
        r = np.asarray(rhs, np.float64) * p.scale
        b = (p.mask_dom * r[np.clip(p.gid, 0, p.N - 1)]).astype(np.float32)
        p.b = b
        self.rhs = np.asarray(rhs)
        self._dev["vec"] = jax.device_put(
            jnp.asarray(pack_plan_vectors(p)), self._shard
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
            carry = jnp.zeros((S * p.C * 8 * self.SEGT, 128), jnp.float32)
        t0 = time.perf_counter()
        rounds = 0
        while rounds < max_rounds:
            x, known, aux, carry = self._mapped(
                self._dev["A"], self._dev["vec"], self._dev["OH"],
                self._dev["U"], self._dev["td"], self._dev["ts"],
                x, known, aux, carry,
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
            # kernel state is the Jacobi-scaled unknown y; x = Ds y
            sol[p.int_ids[s]] = (
                x_h[s, : p.n_int[s]] * p.scale[p.int_ids[s]]
            ).astype(np.float32)
        A_sp = self.mat.to_scipy()
        res = self.rhs - A_sp @ sol
        rel = float(
            np.linalg.norm(res) / max(np.linalg.norm(self.rhs), 1e-300)
        )
        done = np.asarray(aux[::8, 1]).astype(int)
        total_rounds = int(np.asarray(aux[0, 2]))
        msg_bytes = (8 * self.SEGT + 8) * 128 * 4   # lane-packed
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
