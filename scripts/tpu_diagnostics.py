#!/usr/bin/env python
"""Consolidated TPU diagnostics (folds the round-1 tpu_probe*.py one-offs).

Subcommands (run any subset; default = all):
  smoke   — pallas availability + SpMV chain rep-scaling (validates the timer)
  spmv    — DIA/ELL SpMV roofline fraction, f32 + f64, overhead-corrected
  direct  — dense Cholesky/LU factor+solve support matrix per dtype
  ras     — small RAS solves (plain CG, block-Jacobi CG) + instrumented stages
  fgmres  — FGMRES-accelerated vs stationary wall time on a 256^2 Laplacian

Usage: python scripts/tpu_diagnostics.py [smoke spmv direct ras fgmres]
"""
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from schwarz_tpu import Settings, generate_rhs, laplacian_2d  # noqa: E402
from schwarz_tpu.config import Precond  # noqa: E402
from schwarz_tpu.core.decompose import decompose  # noqa: E402


def log(*a):
    print(*a, flush=True)


def chain_time(fn, x0, reps=400, tries=3):
    """Best-of-N timing of `reps` chained fn applications (one compile)."""

    @jax.jit
    def chain(r, x):
        def body(c):
            i, xx = c
            return i + 1, fn(xx)

        return jax.lax.while_loop(lambda c: c[0] < r, body,
                                  (jnp.int32(0), x))[1]

    chain(jnp.int32(2), x0).block_until_ready()
    best = 1e9
    for _ in range(tries):
        t0 = time.perf_counter()
        chain(jnp.int32(reps), x0).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best / reps


def run_smoke():
    log("devices:", jax.devices())
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def k(x_ref, o_ref):
            o_ref[:] = x_ref[:] * 2.0

        @jax.jit
        def f(x):
            return pl.pallas_call(
                k, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)

        t0 = time.time()
        got = float(f(jnp.ones((256, 256), jnp.float32)).sum())
        log(f"pallas smoke ok: {got} (compile {time.time() - t0:.1f}s)")
    except Exception as e:  # pragma: no cover - diagnostics only
        log("pallas smoke FAILED:", repr(e))

    from schwarz_tpu.ops.spmv import ell_spmv_batched

    A = laplacian_2d(1024)
    b = generate_rhs(A.n, random=False)
    dec = decompose(A, b, Settings(overlap=3, dtype="float32",
                                   row_pad_multiple=128), 16)
    vals = jnp.asarray(dec.lmat_vals, jnp.float32)
    cols = jnp.asarray(dec.lmat_cols)
    R = dec.meta.max_rows
    nnz = int((dec.lmat_vals != 0).sum())
    x0 = jnp.ones((16, dec.meta.max_ext), jnp.float32)

    def step(xx):
        y = ell_spmv_batched(vals, cols, xx[:, :R])
        return xx.at[:, :R].set(y * 1e-6 + 1.0)

    for reps in (10, 100, 1000):
        dt = chain_time(step, x0, reps=reps, tries=2)
        log(f"reps={reps} per={dt * 1e6:.2f}us nnz/s={nnz / dt:.3e}")


def run_spmv():
    from schwarz_tpu.ops.dia import dia_ell_spmv, split_dia_ell

    A = laplacian_2d(1024)
    b = generate_rhs(A.n, random=False)
    for dtype, jdt in (("float32", jnp.float32), ("float64", jnp.float64)):
        dec = decompose(A, b, Settings(overlap=3, dtype=dtype,
                                       row_pad_multiple=128), 16)
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
            y = xx[:, :R] * 1.000001
            return xx.at[:, :R].set(y * 1e-6 + 1.0)

        t_full = chain_time(step_spmv, x0)
        t_base = chain_time(step_noop, x0)
        t_spmv = t_full - t_base
        esz = {"float32": 4, "float64": 8}[dtype]
        K = len(hyb.offsets)
        bytes_spmv = (hyb.dia_vals.size * esz + K * 16 * R * esz
                      + 16 * R * esz)
        sol = nnz / (bytes_spmv / 819e9)
        log(f"[{dtype}] full={t_full * 1e6:.1f}us "
            f"overhead={t_base * 1e6:.1f}us spmv={t_spmv * 1e6:.1f}us "
            f"nnz/s={nnz / t_spmv:.3e} roofline_frac={nnz / t_spmv / sol:.2f}")


def run_direct():
    from schwarz_tpu.solvers.direct import (
        cholesky_factor, cholesky_solve, lu_factor, lu_solve,
    )

    A3 = laplacian_2d(8)
    b3 = generate_rhs(A3.n)
    for dt in ("float32", "float64"):
        dec3 = decompose(A3, b3, Settings(overlap=2, dtype=dt), 2)
        v = jnp.asarray(dec3.lmat_vals, dt)
        c = jnp.asarray(dec3.lmat_cols)
        rhs = jnp.asarray(dec3.local_rhs, dt)
        for name, fac, sol in (("cholesky", cholesky_factor, cholesky_solve),
                               ("lu", lu_factor, lu_solve)):
            try:
                x = sol(fac(v, c), rhs)
                jax.block_until_ready(x)
                log(f"direct[{name},{dt}] OK")
            except Exception as e:  # pragma: no cover - diagnostics only
                log(f"direct[{name},{dt}] FAILED: {type(e).__name__}: "
                    f"{str(e)[:120]}")


def run_ras():
    from schwarz_tpu.ras import RASolver

    for tag, s2 in (
        ("plain-cg", Settings(overlap=3, tolerance=1e-6, max_iters=60,
                              dtype="float32", row_pad_multiple=128)),
        ("bjacobi-cg", Settings(overlap=3, tolerance=1e-6, max_iters=60,
                                dtype="float32", local_tolerance=1e-2,
                                local_max_iters=70,
                                precond=Precond.block_jacobi,
                                block_jacobi_block_size=32,
                                row_pad_multiple=128)),
    ):
        A2 = laplacian_2d(64)
        b2 = generate_rhs(A2.n)
        solver = RASolver(decompose(A2, b2, s2, 4))
        t0 = time.time()
        solver.run()
        log(f"RAS[{tag}] compile+run {time.time() - t0:.1f}s; warm...")
        r2 = solver.run()
        log(f"RAS[{tag}] converged={r2.converged} iters={r2.iters} "
            f"rel={r2.relative_residual_norm:.2e} time={r2.solve_time_s:.3f}s")

    A2 = laplacian_2d(256)
    b2 = generate_rhs(A2.n)
    s = Settings(overlap=4, tolerance=1e-4, max_iters=60, dtype="float32",
                 local_tolerance=1e-4, row_pad_multiple=128)
    r = RASolver(decompose(A2, b2, s, 16)).run_instrumented()
    log(f"instrumented: converged={r.converged} iters={r.iters}")
    for k, v in (r.stage_timings or {}).items():
        log(f"  {k:20s} total={v['total'] * 1e3:8.1f}ms "
            f"avg={v['avg'] * 1e6:8.1f}us med={v['med'] * 1e6:8.1f}us")


def run_fgmres():
    from schwarz_tpu.ras import RASolver

    A = laplacian_2d(256)
    b = generate_rhs(A.n, random=False)
    s = Settings(overlap=4, tolerance=1e-6, max_iters=400, dtype="float32",
                 local_tolerance=1e-2, local_max_iters=30,
                 row_pad_multiple=128)
    solver = RASolver(decompose(A, b, s, 16))
    solver.run()
    t0 = time.perf_counter()
    r_st = solver.run()
    t_st = time.perf_counter() - t0
    solver.run_accelerated()
    t0 = time.perf_counter()
    r_fg = solver.run_accelerated()
    t_fg = time.perf_counter() - t0
    log(f"stationary: iters={r_st.iters} time={t_st:.3f}s "
        f"rel={r_st.relative_residual_norm:.2e}")
    log(f"fgmres:     iters={r_fg.iters} time={t_fg:.3f}s "
        f"rel={r_fg.relative_residual_norm:.2e} speedup={t_st / t_fg:.2f}x")


def run_semread():
    """DMA-semaphore completion unit (ops/async_ras.dma_sem_unit_bytes).

    Starts a local async copy of a known size, spins on semaphore_read
    until nonzero, and reports value-before-wait / value-after-wait — the
    calibration behind fresh_read's completion compare.  Verified units:
    interpreter = elements; TPU v5e = bytes/32.  Run this on any NEW TPU
    generation and extend dma_sem_unit_bytes with the result.
    """
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, out, scr, sem):
        cp = pltpu.make_async_copy(x_ref, scr, sem)
        cp.start()

        def cond(c):
            return c == 0

        def body(c):
            return pltpu.semaphore_read(sem)

        v_before = jax.lax.while_loop(cond, body, pltpu.semaphore_read(sem))
        cp.wait()
        v_after = pltpu.semaphore_read(sem)
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        o = jnp.where((lane == 0) & (row == 0),
                      v_before.astype(jnp.float32), 0.0)
        o = jnp.where((lane == 1) & (row == 0),
                      v_after.astype(jnp.float32), o)
        out[:] = o + scr[:] * 0.0

    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32),
                            pltpu.SemaphoreType.DMA],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(x)
    o = np.asarray(out)
    nbytes = 8 * 128 * 4
    log(f"copy bytes: {nbytes}; sem before wait: {o[0, 0]:.0f}; "
        f"after wait: {o[0, 1]:.0f}")
    if o[0, 0] > 0:
        log(f"unit: bytes/{nbytes / o[0, 0]:.0f} per count "
            f"(elements would be {8 * 128})")


ALL = {"smoke": run_smoke, "spmv": run_spmv, "direct": run_direct,
       "ras": run_ras, "fgmres": run_fgmres, "semread": run_semread}

if __name__ == "__main__":
    which = sys.argv[1:] or list(ALL)
    for name in which:
        log(f"===== {name} =====")
        ALL[name]()
    log("DONE")
