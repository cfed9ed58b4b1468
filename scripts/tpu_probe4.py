#!/usr/bin/env python
"""Pallas vs XLA DIA SpMV with a dynamic-rep chain (single compile each)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from schwarz_tpu import Settings, generate_rhs, laplacian_2d
from schwarz_tpu.config import Precond
from schwarz_tpu.core.decompose import decompose
from schwarz_tpu.ops.dia import dia_ell_spmv, split_dia_ell
from schwarz_tpu.ras import RASolver


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

for tag, up in [("pallas", True), ("xla", False)]:
    @jax.jit
    def chain(reps, x, up=up):
        def cond(c):
            return c[0] < reps

        def body(c):
            i, xx = c
            y = dia_ell_spmv(hyb.offsets, dv, rr, rv, rc, xx, use_pallas=up)
            return i + 1, xx.at[:, :R].set(y * 1e-6 + 1.0)

        return jax.lax.while_loop(cond, body, (jnp.int32(0), x))[1]

    t0 = time.time()
    out = chain(jnp.int32(3), x0)
    out.block_until_ready()
    log(f"[{tag}] compile+run {time.time()-t0:.2f}s checksum {float(out.sum()):.6e}")
    for reps in (50, 400):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            chain(jnp.int32(reps), x0).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        log(f"[{tag}] reps={reps} best per={best/reps*1e6:.2f}us "
            f"nnz/s={nnz/(best/reps):.3e}")

# tuned full RAS on 256^2, S=16
A2 = laplacian_2d(256)
b2 = generate_rhs(A2.n)
s3 = Settings(overlap=8, tolerance=1e-6, max_iters=200, dtype="float32",
              local_tolerance=1e-6, precond=Precond.block_jacobi,
              block_jacobi_block_size=32, row_pad_multiple=128)
solver3 = RASolver(decompose(A2, b2, s3, 16))
t0 = time.time()
r3 = solver3.run()
log(f"RAS-tight compile+run {time.time()-t0:.1f}s (pallas={solver3._use_pallas})")
r3 = solver3.run()
log(f"RAS-tight converged={r3.converged} iters={r3.iters} "
    f"rel={r3.relative_residual_norm:.2e} time={r3.solve_time_s:.3f}s")
log("DONE")
