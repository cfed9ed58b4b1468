"""Free-running asynchronous RAS on 2-D block partitions (4 neighbors).

Extends :mod:`schwarz_tpu.ops.async_ras` (the 1-D ring kernel — see there
for the protocol: slot rings, ack-DMA flow control, bounded-staleness
waits, in-band gossip detection) to 2-D px x py block grids of 5-point
stencil operators: each device owns a (by, bx) block of the grid, holds the
extended iterate X (block + overlap + ring) as a 2-D (sublane, lane) tile,
and exchanges FOUR one-sided boundary strips per iteration — left/right
edge columns (packed contiguous before the DMA) and top/bottom edge rows.

Corners: strips are cut from the sender's EXTENDED block, so a left/right
strip carries the sender's top/bottom halo rows and an up/down strip
carries its left/right halo columns — diagonal-neighbor data arrives
two-hop (staleness <= 2B+1), the standard corner trick, well inside the
asynchronous convergence theory's bounded-staleness hypothesis.

The persistent state is the full extended block (halo regions included), so
chunk-launch boundaries reuse the last-known halos naturally; the freshest
drained message still refreshes the halos at the end of each launch.

Scope (fail-loudly): operators whose sparsity lives on the 9-point grid
stencil {0, +-1, +-n, +-(n-1), +-(n+1)} of an n x n grid (laplacian_2d,
advection upwind, anisotropic 9-point, variable coefficients all fine),
f32.  The diagonal couplings read the corner cells of the extended block,
whose data arrives two-hop (staleness <= 2B+1) — still bounded, still
convergent.  Banded non-grid operators use the 1-D kernel; everything
else the staleness emulation.

Block batching (cf. the 1-D kernel's Sl batching): each device may own a
(ply, plx) sub-grid of blocks, folded into one (ply*By, plx*Bx) tile.
The device is the asynchronous rank; same-device neighbor halos refresh
fresh each iteration via in-VMEM strip copies (full-length strips carry
the corner data exactly like the DMA strips), and only the device-edge
strips ride the DMA rings.  The folded 9-point stencil stays exact
because in-domain cells never read past their own extended window (the
outermost ring is excluded from every solve domain) — cross-window reads
hit zero coefficients.  With one device the full px x py asynchronous
block solve runs natively on a single chip.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from schwarz_tpu.exceptions import NotImplementedFeature

HX = 64   # left/right halo width  (ovpx = 63 + stencil ring 1; lane-aligned)
HY = 8    # top/bottom halo height (ovpy = 7 + ring 1; sublane-aligned)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@dataclasses.dataclass
class AsyncPlan2D:
    """Per-device extended-block stencil data (stacked over S = px*py)."""

    S: int
    px: int
    py: int
    n: int                  # grid side
    N: int                  # true global size (n*n)
    bx: int                 # owned block width  (multiple of 128)
    by: int                 # owned block height (multiple of 8)
    Bx: int                 # bx + 2*HX
    By: int                 # by + 2*HY
    coef: np.ndarray        # (S, 9, By, Bx) f32: C,E,W,S,N,SE,SW,NE,NW
    b: np.ndarray           # (S, By, Bx)
    dinv: np.ndarray        # (S, By, Bx)
    mask_dom: np.ndarray    # (S, By, Bx) local solve domain
    mask_int: np.ndarray    # (S, By, Bx) owned block
    boost: "np.ndarray | None" = None   # (S, By, Bx) O-RAS Robin diag term


def build_async_plan_2d(
    mat, rhs, px: int, py: int, oras_weight: float = 0.0,
) -> AsyncPlan2D:
    """Extract per-device 5-point stencil coefficient blocks.

    Raises NotImplementedFeature when the sparsity leaves the 5-point grid
    stencil.  ``oras_weight`` adds the O-RAS Robin diagonal on solve-domain
    boundary cells (preconditioner form — see build_async_plan).
    """
    N = mat.n
    n = int(math.isqrt(N))
    if n * n != N:
        raise NotImplementedFeature(
            f"2-D free-running mode requires a square-grid operator; "
            f"size {N} is not a perfect square"
        )
    rows_of = np.repeat(np.arange(N, dtype=np.int64), np.diff(mat.row_ptrs))
    diffs = mat.col_idxs.astype(np.int64) - rows_of
    allowed = {0, 1, -1, n, -n, n - 1, n + 1, -(n - 1), -(n + 1)}
    offs = set(int(o) for o in np.unique(diffs))
    if not offs <= allowed:
        raise NotImplementedFeature(
            f"2-D free-running mode requires 9-point grid sparsity "
            f"(offsets within {{0, +-1, +-{n}, +-{n} +- 1}}); found offsets "
            f"{sorted(offs - allowed)[:5]} — use the 1-D kernel for banded "
            "operators or the staleness emulation"
        )
    # column drift check: a grid-stencil coupling moves at most one grid
    # column (catches +-1 wrapping across grid rows and degenerate n)
    gx_r = rows_of % n
    gx_c = mat.col_idxs % n
    if np.any(np.abs(gx_r - gx_c) > 1):
        raise NotImplementedFeature(
            "couplings cross grid rows: not a 2-D grid stencil"
        )

    # per-cell coefficient grids: C, E, W, S, N, SE, SW, NE, NW
    key = {0: 0, 1: 1, -1: 2, n: 3, -n: 4,
           n + 1: 5, n - 1: 6, -(n - 1): 7, -(n + 1): 8}
    coef_g = np.zeros((9, n, n), dtype=np.float32)
    for off, k in key.items():
        m = diffs == off
        r = rows_of[m]
        coef_g[k, r // n, r % n] = mat.values[m]
    b_g = np.asarray(rhs, np.float32).reshape(n, n)

    bx = _round_up(_round_up(n, px) // px, 128)
    by = _round_up(_round_up(n, py) // py, 8)
    Bx, By = bx + 2 * HX, by + 2 * HY
    S = px * py

    coef = np.zeros((S, 9, By, Bx), np.float32)
    b = np.zeros((S, By, Bx), np.float32)
    dinv = np.ones((S, By, Bx), np.float32)
    mask_dom = np.zeros((S, By, Bx), np.float32)
    mask_int = np.zeros((S, By, Bx), np.float32)

    # padded global grids (identity rows beyond n)
    nX, nY = px * bx, py * by
    cg = np.zeros((9, nY, nX), np.float32)
    cg[:, :n, :n] = coef_g
    cg[0, :, n:] = 1.0
    cg[0, n:, :] = 1.0
    bg = np.zeros((nY, nX), np.float32)
    bg[:n, :n] = b_g

    for d in range(S):
        dyy, dxx = divmod(d, px)
        y0, x0 = dyy * by, dxx * bx
        ys, ye = y0 - HY, y0 + by + HY
        xs, xe = x0 - HX, x0 + bx + HX
        gy0, gy1 = max(ys, 0), min(ye, nY)
        gx0, gx1 = max(xs, 0), min(xe, nX)
        ty0, tx0 = gy0 - ys, gx0 - xs
        coef[d, :, ty0:ty0 + gy1 - gy0, tx0:tx0 + gx1 - gx0] = (
            cg[:, gy0:gy1, gx0:gx1]
        )
        b[d, ty0:ty0 + gy1 - gy0, tx0:tx0 + gx1 - gx0] = bg[gy0:gy1, gx0:gx1]
        # solve domain: everything but the outermost stencil ring, clipped
        # to the padded grid
        dom = np.zeros((By, Bx), np.float32)
        dom[1:By - 1, 1:Bx - 1] = 1.0
        grid = np.zeros((By, Bx), np.float32)
        grid[ty0:ty0 + gy1 - gy0, tx0:tx0 + gx1 - gx0] = 1.0
        mask_dom[d] = dom * grid
        mask_int[d, HY:HY + by, HX:HX + bx] = 1.0
        dg = coef[d, 0]
        dinv[d] = np.where(np.abs(dg) > 0, 1.0 / np.where(dg == 0, 1, dg),
                           1.0)
    coef *= mask_dom[:, None, :, :]

    boost = None
    if oras_weight:
        c = float(oras_weight)
        if not -1.0 <= c <= 0.0:
            raise ValueError(
                f"oras_weight={c} outside [-1, 0]: the Robin coefficient "
                "must sit in (-1, 0] (0 = Dirichlet, -1 = Neumann limit)"
            )
        # displacement of each stencil entry k (grid rows, grid cols)
        disp = {1: (0, 1), 2: (0, -1), 3: (1, 0), 4: (-1, 0),
                5: (1, 1), 6: (1, -1), 7: (-1, 1), 8: (-1, -1)}
        boost = np.zeros((S, By, Bx), np.float32)
        for d in range(S):
            dom = mask_dom[d] > 0
            for k, (dy, dx) in disp.items():
                # target-in-domain mask: shift dom by (-dy, -dx) with zero
                # (out-of-window == dropped) fill
                tgt = np.zeros_like(dom)
                ys = slice(max(dy, 0), By + min(dy, 0))
                yt = slice(max(-dy, 0), By + min(-dy, 0))
                xs = slice(max(dx, 0), Bx + min(dx, 0))
                xt = slice(max(-dx, 0), Bx + min(-dx, 0))
                tgt[yt, xt] = dom[ys, xs]
                dropped = dom & ~tgt
                boost[d][dropped] += np.abs(coef[d, k][dropped])
        boost *= c
        dg = coef[:, 0] + boost
        dinv = np.where(np.abs(dg) > 0,
                        1.0 / np.where(dg == 0, 1, dg), 1.0).astype(np.float32)

    return AsyncPlan2D(
        S=S, px=px, py=py, n=n, N=N, bx=bx, by=by, Bx=Bx, By=By,
        coef=coef, b=b, dinv=dinv, mask_dom=mask_dom, mask_int=mask_int,
        boost=boost,
    )


def _sh(x: jax.Array, dy: int, dx: int) -> jax.Array:
    """w[i, j] = x[i + dy, j + dx] with wraparound (annihilated by the zero
    coefficient ring)."""
    from jax.experimental.pallas import tpu as pltpu

    By, Bx = x.shape
    out = x
    if dy:
        out = pltpu.roll(out, jnp.int32((By - dy) % By), 0)
    if dx:
        out = pltpu.roll(out, jnp.int32((Bx - dx) % Bx), 1)
    return out


@functools.partial(
    jax.jit,
    static_argnames=(
        "px", "py", "ply", "plx", "bx", "by", "rounds", "staleness",
        "ninner", "tol", "axis_name", "interpret", "fresh_read", "nonsym",
    ),
)
def async_ras_2d_rounds(
    coef: jax.Array,       # (Slb, 9, By, Bx) — device's (ply, plx) windows
    b: jax.Array,          # (Slb, By, Bx)
    dinv: jax.Array,       # (Slb, By, Bx)
    mask_dom: jax.Array,   # (Slb, By, Bx)
    mask_int: jax.Array,   # (Slb, By, Bx)
    X: jax.Array,          # (Slb, By, Bx) extended iterates (halos included)
    known: jax.Array,      # (1, 128)
    aux: jax.Array,        # (1, 128): [0]=rn0, [1]=done_at, [2]=round base
    boost: "jax.Array | None" = None,  # (Slb, By, Bx) O-RAS Robin diagonal
    *,
    px: int, py: int, ply: int, plx: int, bx: int, by: int,
    rounds: int, staleness: int, ninner: int, tol: float,
    axis_name: str, interpret: bool, fresh_read: bool = False,
    nonsym: bool = False,
):
    """Run ``rounds`` free-running 2-D iterations on this device.

    ``px x py`` is the DEVICE grid; each device owns a (ply, plx) sub-grid
    of blocks (Slb = ply*plx, leading dim, row-major over the local grid)
    folded into one (ply*By, plx*Bx) tile — see module docstring.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Bx, By = bx + 2 * HX, by + 2 * HY
    FY, FX = ply * By, plx * Bx
    B = max(staleness, 1)
    M = 2 * B + 2
    T = rounds
    tol2 = float(tol) * float(tol)
    MSG_LR = FY + 8            # (MSG_LR, 128): strip cols in lanes 0..HX-1
    MSG_UD = HY + 8            # (MSG_UD, FX): flags in lanes 0..127

    def fold(a):               # (Slb, By, Bx) -> (FY, FX)
        return (a.reshape(ply, plx, By, Bx)
                .transpose(0, 2, 1, 3).reshape(FY, FX))

    coef3 = (coef.transpose(1, 0, 2, 3)
             .reshape(9, ply, plx, By, Bx)
             .transpose(0, 1, 3, 2, 4).reshape(9, FY, FX))
    b2 = fold(b)
    dinv2 = fold(dinv)
    mdom = fold(mask_dom)
    mint = fold(mask_int)
    X2 = fold(X)
    known2 = jnp.broadcast_to(known.reshape(1, 128), (8, 128))
    aux2 = jnp.broadcast_to(aux.reshape(1, 128), (8, 128))
    use_oras = boost is not None
    NIN = 9 if use_oras else 8

    def kernel(*refs):
        (coef_ref, b_ref, dinv_ref, mdom_ref, mint_ref, x_ref,
         known_ref, aux_ref) = refs[:8]
        boost_ref = refs[8] if use_oras else None
        (x_out, known_out, aux_out) = refs[NIN:NIN + 3]
        (sL, sR, sU, sD, rL, rR, rU, rD,
         ack_src, aL, aR, aU, aD,
         semsL, semsR, semsU, semsD,
         semrL, semrR, semrU, semrD,
         sasL, sasR, sasU, sasD,
         sarL, sarR, sarU, sarD) = refs[NIN + 3:]
        me = jax.lax.axis_index(axis_name)
        dyy = me // jnp.int32(px)
        dxx = jax.lax.rem(me, jnp.int32(px))
        left = dyy * px + jax.lax.rem(dxx - 1 + px, jnp.int32(px))
        right = dyy * px + jax.lax.rem(dxx + 1, jnp.int32(px))
        up = jax.lax.rem(dyy - 1 + py, jnp.int32(py)) * px + dxx
        down = jax.lax.rem(dyy + 1, jnp.int32(py)) * px + dxx
        devty = pltpu.DeviceIdType.LOGICAL

        def mk(src_ring, dst_ring, ssem, rsem, j, dev):
            return pltpu.make_async_remote_copy(
                src_ref=src_ring.at[j], dst_ref=dst_ring.at[j],
                send_sem=ssem.at[j], recv_sem=rsem.at[j],
                device_id=dev, device_id_type=devty,
            )

        # my sL lands in LEFT device's rR ring; my sU in UP device's rD...
        def dma_L(j):
            return mk(sL, rR, semsL, semrR, j, left)

        def dma_R(j):
            return mk(sR, rL, semsR, semrL, j, right)

        def dma_U(j):
            return mk(sU, rD, semsU, semrD, j, up)

        def dma_D(j):
            return mk(sD, rU, semsD, semrU, j, down)

        # acks: after consuming rL[j] (pushed by the LEFT device), credit it
        # in its aR ring (it waits aR before reusing sR... it pushed via
        # dma_R into my rL, so its reuse check is on its send-R slot and the
        # credit must land in ITS ack ring for the R direction).  The ack
        # payload is the shared un-sliced (8, 128) tile.
        def mka(dst_ring, ssem, rsem, j, dev):
            return pltpu.make_async_remote_copy(
                src_ref=ack_src, dst_ref=dst_ring.at[j],
                send_sem=ssem.at[j], recv_sem=rsem.at[j],
                device_id=dev, device_id_type=devty,
            )

        def ack_to_left(j):
            return mka(aR, sasL, sarR, j, left)

        def ack_to_right(j):
            return mka(aL, sasR, sarL, j, right)

        def ack_to_up(j):
            return mka(aD, sasU, sarD, j, up)

        def ack_to_down(j):
            return mka(aU, sasD, sarU, j, down)

        ack_src[:] = jnp.zeros((8, 128), jnp.float32)

        n_dev = px * py            # devices = async ranks in the gossip
        lane8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        known_k = jnp.maximum(
            known_ref[:], jnp.where(lane8 >= n_dev, 1.0, 0.0)
        )
        rn0 = aux_ref[0, 0]
        done_at = aux_ref[0, 1]
        base_t = aux_ref[0, 2]
        # fresh-read peek-hit counter (diagnostics; -1 on the first launch)
        fresh_hits = jnp.maximum(aux_ref[0, 4], 0.0)

        cc = [coef_ref[k] for k in range(9)]
        bb = b_ref[:]
        dv = dinv_ref[:]
        md = mdom_ref[:]
        mi = mint_ref[:]
        bo = boost_ref[:] if use_oras else None

        def apply_dom(v):
            return (cc[0] * v
                    + cc[1] * _sh(v, 0, 1) + cc[2] * _sh(v, 0, -1)
                    + cc[3] * _sh(v, 1, 0) + cc[4] * _sh(v, -1, 0)
                    + cc[5] * _sh(v, 1, 1) + cc[6] * _sh(v, 1, -1)
                    + cc[7] * _sh(v, -1, 1) + cc[8] * _sh(v, -1, -1))

        def dot(u, v):
            s_ = jnp.sum(u * v, axis=1, keepdims=True)
            return jnp.sum(s_, axis=0, keepdims=True)

        def apply_solve(v):
            # O-RAS Robin diagonal on the solve operator only; the
            # residual keeps the true A (fixed point unchanged)
            av = md * apply_dom(v)
            if use_oras:
                av = av + bo * v
            return av

        def cg_dom(r):
            eps = jnp.finfo(jnp.float32).tiny
            z0 = jnp.zeros_like(r)
            s0 = dv * r
            rho0 = dot(r, s0)

            def body(_, c):
                zz, rr_, p, rho = c
                ap = apply_solve(p)
                pap = dot(p, ap)
                alpha = jnp.where(pap > 0, rho / jnp.maximum(pap, eps), 0.0)
                zz = zz + alpha * p
                rr_ = rr_ - alpha * ap
                sn = dv * rr_
                rho_n = dot(rr_, sn)
                beta = jnp.where(rho > 0, rho_n / jnp.maximum(rho, eps), 0.0)
                return zz, rr_, sn + beta * p, rho_n

            z, _, _, _ = jax.lax.fori_loop(0, ninner, body, (z0, r, s0, rho0))
            return z

        def local_correct(r):
            if nonsym:
                from schwarz_tpu.ops.async_ras import _bicgstab_correction

                return _bicgstab_correction(apply_solve, dot, dv, r, ninner)
            return cg_dom(r)

        xx = x_ref[:]
        state = (xx, known_k, rn0, done_at)

        def unpack(jc, t_now, xx, known_k, use_fresh):
            # halo refresh from the 4 consumed messages (two-hop corners:
            # LR strips carry the sender's top/bottom halo rows, UD strips
            # its left/right halo columns); fills the device-edge halos of
            # every edge window of the folded tile.  Rebuilt by
            # concatenation (functional .at[].set lowers to scatter, which
            # Mosaic does not implement); UD strips span the full width so
            # they own the corner cells, like the write order used to.
            # With use_fresh (fresh_read, B > 1) each direction peeks the
            # newer slots' recv semaphores and takes the newest fully
            # landed message — completion counts as in the 1-D kernel
            # (interpret: exact elements; native: sliced-copy bytes/32).
            hits = jnp.float32(0.0)

            def freshest(ring, sems, full_cnt):
                s = ring[jc]
                h = jnp.float32(0.0)
                if use_fresh:
                    for d_ in range(1, B):
                        jn = (t_now - B + d_) % M
                        m = jnp.where(
                            pltpu.semaphore_read(sems.at[jn]) >= full_cnt,
                            1.0, 0.0)
                        s = m * ring[jn] + (1.0 - m) * s
                        h = h + m
                return s, h

            full_lr = MSG_LR * 128 if interpret else MSG_LR * 16
            full_ud = MSG_UD * FX if interpret else MSG_UD * FX // 8
            vL, h1 = freshest(rL, semrL, full_lr)
            vR, h2 = freshest(rR, semrR, full_lr)
            vU, h3 = freshest(rU, semrU, full_ud)
            vD, h4 = freshest(rD, semrD, full_ud)
            hits = h1 + h2 + h3 + h4
            mid = jnp.concatenate(
                [vL[:FY, 0:HX], xx[:, HX:FX - HX],
                 vR[:FY, 0:HX]], axis=1)
            xx = jnp.concatenate(
                [vU[0:HY, 0:FX], mid[HY:FY - HY, :],
                 vD[0:HY, 0:FX]], axis=0)
            for strip in (vL, vR):
                known_k = jnp.maximum(known_k, strip[FY:FY + 8, :])
            for strip in (vU, vD):
                known_k = jnp.maximum(known_k, strip[HY:HY + 8, 0:128])
            return xx, known_k, hits

        def refresh_intra(xs):
            # same-device neighbor halos, fresh each iteration: full-length
            # strips snapshot from the pre-update tile, so corner cells
            # carry the source window's own halo rows/cols (the same
            # two-hop trick the DMA strips use — here with zero lag).
            # Every window is rebuilt by concatenation (no .at[].set in
            # Mosaic); all strips read the pre-update snapshot, and the
            # full-width UD strips own the corner cells — identical to the
            # LR-then-UD write order unpack() mirrors.
            rows = []
            for iy in range(ply):
                r0 = iy * By
                tiles = []
                for ix in range(plx):
                    c0 = ix * Bx
                    w = xs[r0:r0 + By, c0:c0 + Bx]
                    left = (xs[r0:r0 + By, c0 - 2 * HX:c0 - HX]
                            if ix > 0 else w[:, 0:HX])
                    right = (xs[r0:r0 + By, c0 + Bx + HX:c0 + Bx + 2 * HX]
                             if ix < plx - 1 else w[:, Bx - HX:Bx])
                    wm = jnp.concatenate(
                        [left, w[:, HX:Bx - HX], right], axis=1)
                    top = (xs[r0 - 2 * HY:r0 - HY, c0:c0 + Bx]
                           if iy > 0 else wm[0:HY, :])
                    bot = (xs[r0 + By + HY:r0 + By + 2 * HY, c0:c0 + Bx]
                           if iy < ply - 1 else wm[By - HY:By, :])
                    tiles.append(jnp.concatenate(
                        [top, wm[HY:By - HY, :], bot], axis=0))
                rows.append(tiles[0] if plx == 1
                            else jnp.concatenate(tiles, axis=1))
            return rows[0] if ply == 1 else jnp.concatenate(rows, axis=0)

        for t in range(T):
            j = t % M
            xx, known_k, rn0, done_at = state
            if ply > 1 or plx > 1:
                xx = refresh_intra(xx)
            if t >= M:
                for d_ in (dma_L, dma_R, dma_U, dma_D):
                    d_(j).wait_send()
                for a_ in (ack_to_left, ack_to_right, ack_to_up,
                           ack_to_down):
                    a_(j).wait_recv()
            # pack the 4 device-edge strips from the CURRENT folded tile
            sL[j, :FY, 0:HX] = xx[:, HX:2 * HX]
            sL[j, FY:FY + 8, :] = known_k
            sR[j, :FY, 0:HX] = xx[:, FX - 2 * HX:FX - HX]
            sR[j, FY:FY + 8, :] = known_k
            sU[j, 0:HY, 0:FX] = xx[HY:2 * HY, :]
            sU[j, HY:HY + 8, 0:128] = known_k
            sD[j, 0:HY, 0:FX] = xx[FY - 2 * HY:FY - HY, :]
            sD[j, HY:HY + 8, 0:128] = known_k
            for d_ in (dma_L, dma_R, dma_U, dma_D):
                d_(j).start()
            if t >= B:
                jc = (t - B) % M
                for d_ in (dma_L, dma_R, dma_U, dma_D):
                    d_(jc).wait_recv()
                xx, known_k, fh = unpack(jc, t, xx, known_k,
                                         fresh_read and B > 1)
                fresh_hits = fresh_hits + fh
                if t - M >= B:
                    for a_ in (ack_to_left, ack_to_right, ack_to_up,
                               ack_to_down):
                        a_(jc).wait_send()
                for a_ in (ack_to_left, ack_to_right, ack_to_up,
                           ack_to_down):
                    a_(jc).start()
            # ---- the RAS iteration on (possibly stale) halo data ----------
            r = md * (bb - apply_dom(xx))
            rn = dot(mi * r, mi * r)[0, 0]
            rn0 = jnp.where(rn0 < 0, rn, rn0)
            myconv = jnp.where(rn <= tol2 * rn0, 1.0, 0.0)
            mybit = jnp.where(lane8 == me, myconv, 0.0)
            known_new = jnp.maximum(known_k, mybit)
            all_known = jnp.sum(known_new[0:1, :], axis=1)[0] >= 128.0
            frozen = (done_at >= 0) | all_known
            z = local_correct(r)
            xx = jnp.where(frozen | (mi == 0.0), xx, xx + mi * z)
            known_k = known_new
            done_at = jnp.where(
                done_at >= 0, done_at,
                jnp.where(all_known, base_t + jnp.float32(t), -1.0),
            )
            state = (xx, known_k, rn0, done_at)

        # ---- drains (static counts; see the 1-D kernel for the algebra) ---
        xx, known_k, rn0, done_at = state
        for n_ in range(max(T - B, 0), T):
            jc = n_ % M
            for d_ in (dma_L, dma_R, dma_U, dma_D):
                d_(jc).wait_recv()
        if T >= 1:
            # freshest drained message refreshes the halos for next launch
            xx, known_k, _ = unpack((T - 1) % M, T - 1, xx, known_k, False)
        for n_ in range(max(T - M, 0), max(T - B, 0)):
            jn = n_ % M
            for a_ in (ack_to_left, ack_to_right, ack_to_up, ack_to_down):
                a_(jn).wait_recv()
        for t in range(max(T - M, 0), T):
            j = t % M
            for d_ in (dma_L, dma_R, dma_U, dma_D):
                d_(j).wait_send()
        for n_ in range(max(T - B - M, 0), max(T - B, 0)):
            jn = n_ % M
            for a_ in (ack_to_left, ack_to_right, ack_to_up, ack_to_down):
                a_(jn).wait_send()

        x_out[:] = xx
        known_out[:] = known_k
        aux_v = jnp.where(lane8 == 0, rn0, 0.0)
        aux_v = jnp.where(lane8 == 1, done_at, aux_v)
        aux_v = jnp.where(lane8 == 2, base_t + jnp.float32(T), aux_v)
        aux_v = jnp.where(lane8 == 3, rn, aux_v)
        aux_v = jnp.where(lane8 == 4, fresh_hits, aux_v)
        aux_out[:] = aux_v

    args = (coef3, b2, dinv2, mdom, mint, X2, known2, aux2)
    if use_oras:
        args = args + (fold(boost),)
    with jax.enable_x64(False):
        x_o, known_o, aux_o = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * NIN,
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 3,
            out_shape=(
                jax.ShapeDtypeStruct((FY, FX), jnp.float32),
                jax.ShapeDtypeStruct((8, 128), jnp.float32),
                jax.ShapeDtypeStruct((8, 128), jnp.float32),
            ),
            scratch_shapes=(
                [pltpu.VMEM((M, MSG_LR, 128), jnp.float32)] * 2   # sL sR
                + [pltpu.VMEM((M, MSG_UD, FX), jnp.float32)] * 2  # sU sD
                + [pltpu.VMEM((M, MSG_LR, 128), jnp.float32)] * 2  # rL rR
                + [pltpu.VMEM((M, MSG_UD, FX), jnp.float32)] * 2   # rU rD
                + [pltpu.VMEM((8, 128), jnp.float32)]              # ack_src
                + [pltpu.VMEM((M, 8, 128), jnp.float32)] * 4       # aL..aD
                + [pltpu.SemaphoreType.DMA((M,))] * 16
            ),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(*args)
    x_unfold = (x_o.reshape(ply, By, plx, Bx)
                .transpose(0, 2, 1, 3).reshape(ply * plx, By, Bx))
    return x_unfold, known_o[0:1, :], aux_o[0:1, :]


def _device_grid(D: int, px: int, py: int) -> Optional[Tuple[int, int]]:
    """Factor ``D`` devices into a (pdx, pdy) grid tiling the block grid.

    Returns the factorization whose per-device (ply, plx) window sub-grid
    is most balanced, or None when no factorization divides (px, py).
    """
    best = None
    for pdx in range(1, D + 1):
        if D % pdx or px % pdx or py % (D // pdx):
            continue
        pdy = D // pdx
        score = abs(py // pdy - px // pdx)
        if best is None or score < best[0]:
            best = (score, pdx, pdy)
    return None if best is None else (best[1], best[2])


class AsyncRASolver2D:
    """Host driver for the 2-D free-running kernel (cf. AsyncRASolver).

    ``px x py`` is the BLOCK grid.  The mesh may hold fewer devices: each
    device folds a (ply, plx) sub-grid of blocks into one tile (see the
    module docstring) and remains the asynchronous rank.  With one device
    the whole block solve runs natively on a single chip.
    """

    def __init__(self, mat, rhs, px: int, py: int,
                 tolerance: float = 1e-5, staleness: int = 1,
                 ninner: int = 16, chunk_rounds: int = 16,
                 mesh=None, interpret: Optional[bool] = None,
                 fresh_read: bool = False, oras_weight: float = 0.0,
                 nonsym: bool = False, overlap: Optional[int] = None):
        # this kernel's overlap is FIXED by the halo tile geometry:
        # (HX-1, HY-1) = (63, 7) grid cells.  A larger request cannot be
        # honored — raise so the dispatch falls through to the 1-D banded
        # kernel, which honors arbitrary overlap (no silently inert knobs).
        # Smaller requests get MORE overlap than asked, which is a valid
        # (at-least-as-convergent) RAS.
        if overlap is not None and overlap > HY - 1:
            raise NotImplementedFeature(
                f"the 2-D free-running kernel provides a fixed "
                f"({HX - 1}, {HY - 1})-cell overlap; requested overlap "
                f"{overlap} exceeds it — the 1-D banded kernel honors "
                "arbitrary overlap"
            )
        from jax.sharding import PartitionSpec as P

        from schwarz_tpu.parallel.mesh import SUBD_AXIS, make_mesh

        self.plan = build_async_plan_2d(mat, rhs, px, py,
                                        oras_weight=oras_weight)
        self.oras_weight = float(oras_weight)
        self.nonsym = bool(nonsym)
        self.mat = mat
        self.rhs = np.asarray(rhs)
        self.tolerance = tolerance
        self.chunk_rounds = chunk_rounds
        S = px * py
        if mesh is None:
            ndev = len(jax.devices())
            D = next(d for d in range(min(ndev, S), 0, -1)
                     if _device_grid(d, px, py) is not None)
            mesh = make_mesh(jax.devices()[:D])
        self.D = D = mesh.devices.size
        grid = _device_grid(D, px, py)
        if grid is None:
            raise ValueError(
                f"mesh size {D} cannot tile the {px} x {py} block grid; "
                "pick a device count with a factorization dividing (px, py)"
            )
        pdx, pdy = grid
        self.pdx, self.pdy = pdx, pdy
        ply, plx = py // pdy, px // pdx
        self.ply, self.plx = ply, plx
        self.mesh = mesh
        if interpret is None:
            interpret = mesh.devices.reshape(-1)[0].platform == "cpu"
        p = self.plan
        # VMEM guard for the folded tile (inputs + rings + loop temps)
        FY, FX = ply * p.By, plx * p.Bx
        M = 2 * max(staleness, 1) + 2
        est = 4 * (16 * FY * FX + 4 * M * ((FY + 8) * 128
                                           + (HY + 8) * FX))
        if est > 14 * 2 ** 20:
            raise NotImplementedFeature(
                f"folded {ply}x{plx} window tile needs ~{est >> 20} MiB "
                "VMEM; use more devices or the staleness emulation"
            )
        # stacked-block permutation: position i holds global block
        # perm[i]; each device's (ply, plx) windows contiguous, row-major
        perm = np.empty(S, np.int64)
        i = 0
        for Dy in range(pdy):
            for Dx in range(pdx):
                for iy in range(ply):
                    for ix in range(plx):
                        perm[i] = (Dy * ply + iy) * px + (Dx * plx + ix)
                        i += 1
        self._perm = perm
        kern = functools.partial(
            async_ras_2d_rounds,
            px=pdx, py=pdy, ply=ply, plx=plx, bx=p.bx, by=p.by,
            rounds=chunk_rounds, staleness=staleness, ninner=ninner,
            tol=tolerance, axis_name=SUBD_AXIS, interpret=interpret,
            fresh_read=fresh_read, nonsym=nonsym,
        )
        spec = P(SUBD_AXIS)
        n_in = 9 if p.boost is not None else 8
        self._mapped = jax.jit(jax.shard_map(
            kern, mesh=mesh, in_specs=(spec,) * n_in,
            out_specs=(spec, spec, spec), check_vma=False,
        ))
        shard = self._shard = jax.sharding.NamedSharding(mesh, spec)
        self._dev = {
            "coef": jax.device_put(jnp.asarray(p.coef[perm]), shard),
            "b": jax.device_put(jnp.asarray(p.b[perm]), shard),
            "dinv": jax.device_put(jnp.asarray(p.dinv[perm]), shard),
            "mask_dom": jax.device_put(jnp.asarray(p.mask_dom[perm]),
                                       shard),
            "mask_int": jax.device_put(jnp.asarray(p.mask_int[perm]),
                                       shard),
        }
        if p.boost is not None:
            self._dev["boost"] = jax.device_put(
                jnp.asarray(p.boost[perm]), shard
            )

    def set_rhs(self, rhs) -> None:
        """Repack the per-block RHS windows without rebuilding the plan
        (same window slicing as build_async_plan_2d)."""
        p = self.plan
        nY, nX = p.py * p.by, p.px * p.bx
        bg = np.zeros((nY, nX), np.float32)
        bg[:p.n, :p.n] = np.asarray(rhs, np.float32).reshape(p.n, p.n)
        b = np.zeros((p.S, p.By, p.Bx), np.float32)
        for d in range(p.S):
            dyy, dxx = divmod(d, p.px)
            y0, x0 = dyy * p.by, dxx * p.bx
            ys, xs = y0 - HY, x0 - HX
            gy0, gy1 = max(ys, 0), min(y0 + p.by + HY, nY)
            gx0, gx1 = max(xs, 0), min(x0 + p.bx + HX, nX)
            ty0, tx0 = gy0 - ys, gx0 - xs
            b[d, ty0:ty0 + gy1 - gy0, tx0:tx0 + gx1 - gx0] = (
                bg[gy0:gy1, gx0:gx1]
            )
        p.b = b
        self.rhs = np.asarray(rhs)
        self._dev["b"] = jax.device_put(
            jnp.asarray(b[self._perm]), self._shard
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
        """Persist a free-running state (X incl. halo windows, known, aux)."""
        np.savez_compressed(path, *[np.asarray(a) for a in state])

    def load_checkpoint(self, path: str):
        import os

        # np.savez_compressed appends .npz to a suffix-less path; accept
        # the same path back (save/load symmetry)
        if not os.path.exists(path) and os.path.exists(path + ".npz"):
            path = path + ".npz"
        data = np.load(path)
        return tuple(jnp.asarray(data[f"arr_{i}"]) for i in range(3))

    def run(self, max_rounds: int = 400, resume_state=None,
            checkpoint_path: Optional[str] = None):
        import time

        p = self.plan
        S = p.S
        if resume_state is not None:
            X, known, aux = resume_state
        else:
            X = jnp.zeros((S, p.By, p.Bx), jnp.float32)
            known = jnp.zeros((self.D, 128), jnp.float32)
            aux = jnp.full((self.D, 128), -1.0,
                           jnp.float32).at[:, 2].set(0.0)
        t0 = time.perf_counter()
        rounds = 0
        extra = ((self._dev["boost"],) if "boost" in self._dev else ())
        while rounds < max_rounds:
            X, known, aux = self._mapped(
                self._dev["coef"], self._dev["b"], self._dev["dinv"],
                self._dev["mask_dom"], self._dev["mask_int"],
                X, known, aux, *extra,
            )
            rounds += self.chunk_rounds
            done = np.asarray(aux[:, 1])
            if np.all(done >= 0):
                break
        elapsed = time.perf_counter() - t0
        if checkpoint_path is not None:
            self.save_checkpoint((X, known, aux), checkpoint_path)
        X_h = np.asarray(jax.block_until_ready(X))
        sol_grid = np.zeros((p.py * p.by, p.px * p.bx), np.float32)
        for i in range(S):
            dyy, dxx = divmod(int(self._perm[i]), p.px)
            sol_grid[dyy * p.by:(dyy + 1) * p.by,
                     dxx * p.bx:(dxx + 1) * p.bx] = (
                X_h[i, HY:HY + p.by, HX:HX + p.bx]
            )
        sol = sol_grid[:p.n, :p.n].reshape(-1)
        res = self.rhs - self.mat.to_scipy() @ sol
        rel = float(np.linalg.norm(res) / max(np.linalg.norm(self.rhs),
                                              1e-300))
        done = np.asarray(aux[:, 1]).astype(int)
        return sol, {
            "done_at": done,
            "converged": bool(np.all(done >= 0)),
            "rounds": rounds,
            "relative_residual_norm": rel,
            "time_s": elapsed,
            "grid": (p.py, p.px),
            "device_grid": (self.pdy, self.pdx),
            "fresh_read_hits": int(np.maximum(np.asarray(aux[:, 4]),
                                              0.0).sum()),
        }
