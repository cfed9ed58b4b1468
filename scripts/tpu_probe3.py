#!/usr/bin/env python
"""Pallas vs XLA DIA SpMV on TPU + tuned full-RAS timing."""
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from schwarz_tpu import Settings, generate_rhs, laplacian_2d  # noqa: E402
from schwarz_tpu.config import Precond  # noqa: E402
from schwarz_tpu.core.decompose import decompose  # noqa: E402
from schwarz_tpu.ops.dia import dia_ell_spmv, split_dia_ell  # noqa: E402
from schwarz_tpu.ras import RASolver  # noqa: E402


def log(*a):
    print(*a, flush=True)


log("devices:", jax.devices())
A = laplacian_2d(1024)
b = generate_rhs(A.n, random=False)
dec = decompose(A, b, Settings(overlap=3, dtype="float32", row_pad_multiple=128), 16)
hyb = split_dia_ell(dec.lmat_vals, dec.lmat_cols, dec.rows_count)
dv = jnp.asarray(hyb.dia_vals, jnp.float32)
rr = jnp.asarray(hyb.rem_rows)
rv = jnp.asarray(hyb.rem_vals, jnp.float32)
rc = jnp.asarray(hyb.rem_cols)
R = dec.meta.max_rows
nnz = int((dec.lmat_vals != 0).sum())
x0 = jnp.ones((16, dec.meta.max_ext), jnp.float32)
log("offsets:", hyb.offsets, "R:", R, "nnz:", nnz)

reps = 400
for tag, up in [("xla", False), ("pallas", True)]:
    @jax.jit
    def chain(dvv, rrr, rvv, rcc, x, up=up):
        def body(_, xx):
            y = dia_ell_spmv(hyb.offsets, dvv, rrr, rvv, rcc, xx, use_pallas=up)
            return xx.at[:, :R].set(y * 1e-6 + 1.0)
        return jax.lax.fori_loop(0, reps, body, x)

    t0 = time.time()
    r = chain(dv, rr, rv, rc, x0)
    r.block_until_ready()
    log(f"[{tag}] compile+run {time.time()-t0:.2f}s checksum {float(r.sum()):.6e}")
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        chain(dv, rr, rv, rc, x0).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    log(f"[{tag}] best per={best/reps*1e6:.2f}us nnz/s={nnz/(best/reps):.3e}")

# tuned full RAS: 256^2 Poisson, S=16, two-stage bjacobi config
A2 = laplacian_2d(256)
b2 = generate_rhs(A2.n)
s2 = Settings(
    overlap=8, tolerance=1e-6, max_iters=1000, dtype="float32",
    local_tolerance=1e-2, local_max_iters=70,
    precond=Precond.block_jacobi, block_jacobi_block_size=32,
    row_pad_multiple=128,
)
dec2 = decompose(A2, b2, s2, 16)
solver = RASolver(dec2)
t0 = time.time()
r1 = solver.run()
log(f"RAS compile+run {time.time()-t0:.1f}s")
r2 = solver.run()
log(f"RAS converged={r2.converged} iters={r2.iters} "
    f"rel={r2.relative_residual_norm:.2e} time={r2.solve_time_s:.3f}s "
    f"pallas={solver._use_pallas}")
# also a tighter local solve config (exact local solves, fewer outer iters)
s3 = Settings(overlap=8, tolerance=1e-6, max_iters=200, dtype="float32",
              local_tolerance=1e-6, precond=Precond.block_jacobi,
              block_jacobi_block_size=32, row_pad_multiple=128)
solver3 = RASolver(decompose(A2, b2, s3, 16))
r3 = solver3.run()
r3 = solver3.run()
log(f"RAS-tight converged={r3.converged} iters={r3.iters} "
    f"rel={r3.relative_residual_norm:.2e} time={r3.solve_time_s:.3f}s")
log("DONE")
