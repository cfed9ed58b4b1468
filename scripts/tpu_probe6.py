#!/usr/bin/env python
"""Round-1 wrap-up measurements: chain-overhead-corrected SpMV, f64 SpMV,
per-stage instrumented timings on TPU."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from schwarz_tpu import Settings, generate_rhs, laplacian_2d
from schwarz_tpu.core.decompose import decompose
from schwarz_tpu.ops.dia import dia_ell_spmv, split_dia_ell


def log(*a):
    print(*a, flush=True)


def chain_time(fn, x0, reps=400, tries=3):
    @jax.jit
    def chain(r, x):
        def cond(c):
            return c[0] < r

        def body(c):
            i, xx = c
            return i + 1, fn(xx)

        return jax.lax.while_loop(cond, body, (jnp.int32(0), x))[1]

    chain(jnp.int32(2), x0).block_until_ready()
    best = 1e9
    for _ in range(tries):
        t0 = time.perf_counter()
        chain(jnp.int32(reps), x0).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best / reps


log("devices:", jax.devices())
A = laplacian_2d(1024)
b = generate_rhs(A.n, random=False)

for dtype, jdt in [("float32", jnp.float32), ("float64", jnp.float64)]:
    dec = decompose(A, b, Settings(overlap=3, dtype=dtype, row_pad_multiple=128), 16)
    hyb = split_dia_ell(dec.lmat_vals, dec.lmat_cols, dec.rows_count)
    dv = jnp.asarray(hyb.dia_vals, jdt)
    rr = jnp.asarray(hyb.rem_rows)
    rv = jnp.asarray(hyb.rem_vals, jdt)
    rc = jnp.asarray(hyb.rem_cols)
    R = dec.meta.max_rows
    nnz = int((dec.lmat_vals != 0).sum())
    x0 = jnp.ones((16, dec.meta.max_ext), jdt)

    def step_spmv(xx):
        y = dia_ell_spmv(hyb.offsets, dv, rr, rv, rc, xx)
        return xx.at[:, :R].set(y * 1e-6 + 1.0)

    def step_noop(xx):
        # same feedback structure without the SpMV: measures chain overhead
        y = xx[:, :R] * 1.000001
        return xx.at[:, :R].set(y * 1e-6 + 1.0)

    t_full = chain_time(step_spmv, x0)
    t_base = chain_time(step_noop, x0)
    t_spmv = t_full - t_base
    esz = {"float32": 4, "float64": 8}[dtype]
    K = len(hyb.offsets)
    bytes_spmv = hyb.dia_vals.size * esz + K * 16 * R * esz + 16 * R * esz
    sol = nnz / (bytes_spmv / 819e9)
    log(f"[{dtype}] full={t_full*1e6:.1f}us overhead={t_base*1e6:.1f}us "
        f"spmv={t_spmv*1e6:.1f}us nnz/s={nnz/t_spmv:.3e} "
        f"roofline_frac={nnz/t_spmv/sol:.2f}")

# variant: roll-based DIA (no padded copy; wrapped reads hit zero diagonals)
dec32 = decompose(A, b, Settings(overlap=3, dtype="float32",
                                 row_pad_multiple=128), 16)
hyb32 = split_dia_ell(dec32.lmat_vals, dec32.lmat_cols, dec32.rows_count)
dv32 = jnp.asarray(hyb32.dia_vals, jnp.float32)
R32 = dec32.meta.max_rows
nnz32 = int((dec32.lmat_vals != 0).sum())
x32 = jnp.ones((16, dec32.meta.max_ext), jnp.float32)


def spmv_roll(xx):
    xr = xx[:, :R32]
    y = jnp.zeros_like(xr)
    for k, off in enumerate(hyb32.offsets):
        y = y + dv32[:, k, :] * jnp.roll(xr, -off, axis=1)
    return xx.at[:, :R32].set(y * 1e-6 + 1.0)


t_roll = chain_time(spmv_roll, x32)
log(f"[roll-variant f32] per={t_roll*1e6:.1f}us nnz/s={nnz32/t_roll:.3e}")

# direct-solver support matrix on TPU
from schwarz_tpu.solvers.direct import (  # noqa: E402
    cholesky_factor, cholesky_solve, lu_factor, lu_solve,
)

A3 = laplacian_2d(8)
b3 = generate_rhs(A3.n)
for dt in ("float32", "float64"):
    dec3 = decompose(A3, b3, Settings(overlap=2, dtype=dt), 2)
    v = jnp.asarray(dec3.lmat_vals, dt)
    c = jnp.asarray(dec3.lmat_cols)
    rhs = jnp.asarray(dec3.local_rhs, dt)
    for name, fac, sol in (
        ("cholesky", cholesky_factor, cholesky_solve),
        ("lu", lu_factor, lu_solve),
    ):
        try:
            f = fac(v, c)
            x = sol(f, rhs)
            jax.block_until_ready(x)
            log(f"direct[{name},{dt}] OK")
        except Exception as e:
            log(f"direct[{name},{dt}] FAILED: {type(e).__name__}: "
                f"{str(e)[:120]}")

# instrumented per-stage timings (allgather, CG) on a mid-size problem
from schwarz_tpu.ras import RASolver  # noqa: E402

A2 = laplacian_2d(256)
b2 = generate_rhs(A2.n)
s = Settings(overlap=4, tolerance=1e-4, max_iters=60, dtype="float32",
             local_tolerance=1e-4, row_pad_multiple=128)
solver = RASolver(decompose(A2, b2, s, 16))
r = solver.run_instrumented()
log(f"instrumented: converged={r.converged} iters={r.iters}")
for k, v in (r.stage_timings or {}).items():
    log(f"  {k:20s} total={v['total']*1e3:8.1f}ms avg={v['avg']*1e6:8.1f}us "
        f"med={v['med']*1e6:8.1f}us")
log("DONE")
