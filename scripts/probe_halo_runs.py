#!/usr/bin/env python
"""Probe variants of the runs-based x_ext assembly on the TPU.

Current bench number: ~442 us for the 1M-row plan's halo pack (0.2% of
roofline).  Hypothesis: each vmapped dynamic_update_slice lowers to a
scatter that copies the whole (Sl, r_ext + pad) buffer, and pad is
max(r_int, L_max) + 1 = 65537 — twice the necessary width.  Variants:

  A  current assemble_x_ext_runs (baseline)
  A2 pad = L_max + 1 (interior DUS cannot clamp: off + r_int <= r_ext)
  B  A2 + the per-class run loop as lax.fori_loop with buf as the carry
     (XLA updates loop-carried buffers in place)

Run: python scripts/probe_halo_runs.py   (default env = axon TPU)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from schwarz_tpu.config import Precond, Settings
from schwarz_tpu.core.decompose import decompose
from schwarz_tpu.models import generate_rhs, laplacian_2d
from schwarz_tpu.parallel.exchange import (
    assemble_x_ext_runs,
    build_run_plan,
)


def chain_time(step, x0, reps=200, tries=3):
    def chain(reps, x):
        def body(c):
            return step(c)
        return jax.lax.fori_loop(0, reps, lambda i, c: body(c), x)

    jc = jax.jit(chain, static_argnums=0)
    y = jax.block_until_ready(jc(2, x0))
    best = np.inf
    for _ in range(tries):
        t0 = time.perf_counter()
        y = jax.block_until_ready(jc(reps, x0))
        best = min(best, (time.perf_counter() - t0) / reps)
    return best, y


def main():
    n1d = 1024
    S = 16
    A = laplacian_2d(n1d)
    b = generate_rhs(A.n)
    st = Settings(overlap=8, row_pad_multiple=128, dtype=jnp.float32,
                  precond=Precond.none)
    dec = decompose(A, b, st, S)
    rp = build_run_plan(
        dec.halo_src_halo, dec.halo_slots, dec.meta.max_ext,
        dec.meta.max_interior, dec.interior_offset,
    )
    assert rp is not None
    r_int = dec.meta.max_interior
    r_ext = dec.meta.max_ext
    print(f"r_int={r_int} r_ext={r_ext} lengths={rp.lengths} "
          f"runs/class={[t.shape[1] for t in rp.run_src]}")

    interior_off = jnp.asarray(dec.interior_offset.astype(np.int32))
    rs = tuple(jnp.asarray(t) for t in rp.run_src)
    rd = tuple(jnp.asarray(t) for t in rp.run_dst)
    # varying values so index errors cannot hide in the equality checks
    xo0 = jnp.asarray(
        np.random.default_rng(0).standard_normal((S, r_int)), jnp.float32
    )
    L_max = max(rp.lengths)

    def reduce_keep(xo, x_ext):
        return xo * 0.999999 + jnp.sum(x_ext, axis=1, keepdims=True) * 1e-12

    # --- A: current implementation --------------------------------------
    def step_A(xo):
        x_ext = assemble_x_ext_runs(
            xo, xo.reshape(-1), interior_off, rp.lengths, rs, rd,
            r_ext, jnp.float32,
        )
        return reduce_keep(xo, x_ext)

    # --- A2: minimal pad --------------------------------------------------
    def assemble_small_pad(x_own, x_all_flat):
        Sl = x_own.shape[0]
        pad = L_max + 1
        buf = jnp.zeros((Sl, r_ext + pad), x_own.dtype)
        buf = jax.vmap(
            lambda bb, xx, o: jax.lax.dynamic_update_slice(bb, xx, (o,))
        )(buf, x_own, interior_off)
        x_all_flat = jnp.pad(x_all_flat, (0, L_max))
        for L, srcs, dsts in zip(rp.lengths, rs, rd):
            for k in range(srcs.shape[1]):
                vals = jax.vmap(
                    lambda s0: jax.lax.dynamic_slice(x_all_flat, (s0,), (L,))
                )(srcs[:, k])
                buf = jax.vmap(
                    lambda bb, v, d: jax.lax.dynamic_update_slice(
                        bb, v, (d,))
                )(buf, vals, dsts[:, k])
        return buf[:, :r_ext]

    def step_A2(xo):
        return reduce_keep(xo, assemble_small_pad(xo, xo.reshape(-1)))

    # --- B: fori_loop carry (in-place DUS) -------------------------------
    def assemble_loop(x_own, x_all_flat):
        Sl = x_own.shape[0]
        pad = L_max + 1
        buf = jnp.zeros((Sl, r_ext + pad), x_own.dtype)
        buf = jax.vmap(
            lambda bb, xx, o: jax.lax.dynamic_update_slice(bb, xx, (o,))
        )(buf, x_own, interior_off)
        x_all_flat = jnp.pad(x_all_flat, (0, L_max))
        for L, srcs, dsts in zip(rp.lengths, rs, rd):
            def body(k, bb, srcs=srcs, dsts=dsts, L=L):
                vals = jax.vmap(
                    lambda s0: jax.lax.dynamic_slice(
                        x_all_flat, (s0,), (L,))
                )(jax.lax.dynamic_index_in_dim(srcs, k, 1, keepdims=False))
                return jax.vmap(
                    lambda b2, v, d: jax.lax.dynamic_update_slice(
                        b2, v, (d,))
                )(bb, vals,
                  jax.lax.dynamic_index_in_dim(dsts, k, 1, keepdims=False))
            buf = jax.lax.fori_loop(0, srcs.shape[1], body, buf)
        return buf[:, :r_ext]

    def step_B(xo):
        return reduce_keep(xo, assemble_loop(xo, xo.reshape(-1)))

    # --- C: unrolled per-subdomain scalar-offset DUS (no scatter) ---------
    def assemble_unrolled(x_own, x_all_flat):
        Sl = x_own.shape[0]
        pad = L_max + 1
        buf = jnp.zeros((Sl, r_ext + pad), x_own.dtype)
        off_h = np.asarray(dec.interior_offset.astype(np.int32))
        for s in range(Sl):
            buf = jax.lax.dynamic_update_slice(
                buf, x_own[s:s + 1], (s, int(off_h[s])))
        x_all_flat = jnp.pad(x_all_flat, (0, L_max))
        # host-static starts: every copy is a static slice (fusable)
        for L, srcs_h, dsts_h in zip(rp.lengths, rp.run_src, rp.run_dst):
            for k in range(srcs_h.shape[1]):
                for s in range(Sl):
                    s0, d0 = int(srcs_h[s, k]), int(dsts_h[s, k])
                    v = x_all_flat[s0:s0 + L]
                    buf = jax.lax.dynamic_update_slice(
                        buf, v[None, :], (s, d0))
        return buf[:, :r_ext]

    def step_C(xo):
        return reduce_keep(xo, assemble_unrolled(xo, xo.reshape(-1)))

    # --- D: unrolled rows, TRACED scalar offsets (SPMD-compatible) --------
    def assemble_unrolled_dyn(x_own, x_all_flat):
        Sl = x_own.shape[0]
        pad = L_max + 1
        buf = jnp.zeros((Sl, r_ext + pad), x_own.dtype)
        for s in range(Sl):
            buf = jax.lax.dynamic_update_slice(
                buf, x_own[s:s + 1], (jnp.int32(s), interior_off[s]))
        x_all_flat = jnp.pad(x_all_flat, (0, L_max))
        for L, srcs, dsts in zip(rp.lengths, rs, rd):
            for k in range(srcs.shape[1]):
                for s in range(Sl):
                    v = jax.lax.dynamic_slice(
                        x_all_flat, (srcs[s, k],), (L,))
                    buf = jax.lax.dynamic_update_slice(
                        buf, v[None, :], (jnp.int32(s), dsts[s, k]))
        return buf[:, :r_ext]

    def step_D(xo):
        return reduce_keep(xo, assemble_unrolled_dyn(xo, xo.reshape(-1)))

    # --- E: contiguous-ext slice + validity mask ---------------------------
    # For sorted-closure 1-D strips every subdomain's ext ids are ONE
    # contiguous global range: slot j = global (c_s + j).  Detect c_s from
    # the run tables + interior window; one vmapped dynamic_slice + one
    # mask multiply replaces every copy.  Exact (incl. interior) when
    # halo_dtype is None, since x_all IS the x_own blocks.
    c_host = np.full(S, np.iinfo(np.int32).max, np.int64)
    ok_contig = True
    off_h = dec.interior_offset.astype(np.int64)
    for s in range(S):
        cs = s * r_int - off_h[s]
        for srcs_h, dsts_h, L in zip(rp.run_src, rp.run_dst, rp.lengths):
            for k in range(srcs_h.shape[1]):
                if dsts_h[s, k] >= r_ext:   # scratch-directed dummy
                    continue
                if srcs_h[s, k] - dsts_h[s, k] != cs:
                    ok_contig = False
        if cs < 0:
            ok_contig = False
        c_host[s] = cs
    print("contiguous-ext detected:", ok_contig, c_host[:4])
    mask_h = np.zeros((S, r_ext), np.float32)
    for s in range(S):
        mask_h[s, off_h[s]:off_h[s] + r_int] = 1.0
        hs = dec.halo_slots[s]
        mask_h[s, hs[hs < r_ext]] = 1.0
    mask_d = jnp.asarray(mask_h)
    starts_d = jnp.asarray(np.maximum(c_host, 0).astype(np.int32))

    def assemble_contig(x_own, x_all_flat):
        xpad = jnp.pad(x_all_flat, (0, r_ext))
        buf = jax.vmap(
            lambda st: jax.lax.dynamic_slice(xpad, (st,), (r_ext,))
        )(starts_d)
        return buf * mask_d

    def step_E(xo):
        return reduce_keep(xo, assemble_contig(xo, xo.reshape(-1)))

    # --- noop baseline ----------------------------------------------------
    def step_noop(xo):
        return xo * 0.999999 + jnp.sum(
            jnp.pad(xo, ((0, 0), (0, r_ext - r_int))), axis=1, keepdims=True
        ) * 1e-12

    # correctness first (on tiny reps)
    ya = jax.jit(step_A)(xo0)
    variants = [("A2", step_A2), ("B", step_B), ("C", step_C),
                ("D", step_D)]
    if ok_contig:
        variants.append(("E", step_E))
    for name, stp in variants:
        yv = jax.jit(stp)(xo0)
        err = float(jnp.abs(ya - yv).max())
        print(f"{name} vs A max diff: {err:.3e}")
        assert err == 0.0, name

    t0, _ = chain_time(step_noop, xo0)
    for name, stp in [("A", step_A)] + variants:
        t, _ = chain_time(stp, xo0)
        halo = t - t0
        print(f"{name}: chain {t*1e6:.1f} us  halo {halo*1e6:.1f} us  "
              f"({S * dec.halo_slots.shape[1] / max(halo, 1e-9) / 1e9:.2f} "
              "Gelem/s)", flush=True)


if __name__ == "__main__":
    main()
