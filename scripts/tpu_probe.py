#!/usr/bin/env python
"""One-shot TPU measurement batch (run in background; remote compiles are slow).

Measures: pallas availability, SpMV chain rep-scaling (validates the timer),
and a small RAS solve (isolates the device fault seen in bench.py).
"""
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def log(*a):
    print(*a, flush=True)


log("devices:", jax.devices())

# ---- 1. pallas smoke --------------------------------------------------------
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
    log(f"pallas smoke ok: {got} (compile {time.time()-t0:.1f}s)")
except Exception as e:
    log("pallas smoke FAILED:", repr(e))

# ---- 2. SpMV chain rep-scaling ---------------------------------------------
from schwarz_tpu import Settings, generate_rhs, laplacian_2d  # noqa: E402
from schwarz_tpu.core.decompose import decompose  # noqa: E402
from schwarz_tpu.ops.spmv import ell_spmv_batched  # noqa: E402

A = laplacian_2d(1024)
b = generate_rhs(A.n, random=False)
dec = decompose(A, b, Settings(overlap=3, dtype="float32", row_pad_multiple=128), 16)
vals = jnp.asarray(dec.lmat_vals, jnp.float32)
cols = jnp.asarray(dec.lmat_cols)
R = dec.meta.max_rows
nnz = int((dec.lmat_vals != 0).sum())
x0 = jnp.ones((16, dec.meta.max_ext), jnp.float32)


def mk(reps):
    @jax.jit
    def chain(v, c, x):
        def body(_, xx):
            y = ell_spmv_batched(v, c, xx[:, :R])
            return xx.at[:, :R].set(y * 1e-6 + 1.0)
        return jax.lax.fori_loop(0, reps, body, x)
    return chain


for reps in [10, 100, 1000]:
    ch = mk(reps)
    t0 = time.time()
    r = ch(vals, cols, x0)
    r.block_until_ready()
    log(f"reps={reps} compile+run {time.time()-t0:.1f}s")
    t0 = time.perf_counter()
    ch(vals, cols, x0).block_until_ready()
    dt = time.perf_counter() - t0
    log(f"reps={reps} total={dt*1e3:.2f}ms per={dt/reps*1e6:.2f}us "
        f"nnz/s={nnz/(dt/reps):.3e}")
log("checksum", float(r.sum()))

# ---- 3. small RAS solve on TPU ---------------------------------------------
from schwarz_tpu.config import Precond  # noqa: E402
from schwarz_tpu.ras import RASolver  # noqa: E402

for tag, s2 in [
    ("plain-cg", Settings(overlap=3, tolerance=1e-6, max_iters=60,
                          dtype="float32", row_pad_multiple=128)),
    ("bjacobi-cg", Settings(overlap=3, tolerance=1e-6, max_iters=60,
                            dtype="float32", local_tolerance=1e-2,
                            local_max_iters=70, precond=Precond.block_jacobi,
                            block_jacobi_block_size=32, row_pad_multiple=128)),
]:
    try:
        A2 = laplacian_2d(64)
        b2 = generate_rhs(A2.n)
        dec2 = decompose(A2, b2, s2, 4)
        solver = RASolver(dec2)
        t0 = time.time()
        r1 = solver.run()
        log(f"RAS[{tag}] compile+run {time.time()-t0:.1f}s; warm...")
        r2 = solver.run()
        log(f"RAS[{tag}] converged={r2.converged} iters={r2.iters} "
            f"rel={r2.relative_residual_norm:.2e} time={r2.solve_time_s:.3f}s")
    except Exception as e:
        log(f"RAS[{tag}] FAILED:", repr(e))

log("DONE")
