#!/usr/bin/env python
"""Standalone Pallas DIA kernel on TPU (no while_loop chain): compile + time."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from schwarz_tpu import Settings, generate_rhs, laplacian_2d
from schwarz_tpu.core.decompose import decompose
from schwarz_tpu.ops.dia import split_dia_ell
from schwarz_tpu.ops.pallas_kernels import dia_spmv_pallas


def log(*a):
    print(*a, flush=True)


log("devices:", jax.devices())
A = laplacian_2d(1024)
b = generate_rhs(A.n, random=False)
dec = decompose(A, b, Settings(overlap=3, dtype="float32", row_pad_multiple=128), 16)
hyb = split_dia_ell(dec.lmat_vals, dec.lmat_cols, dec.rows_count)
dv = jnp.asarray(hyb.dia_vals, jnp.float32)
R = dec.meta.max_rows
M = hyb.max_abs_offset
nnz = int((dec.lmat_vals != 0).sum())
xpad = jnp.ones((16, R + 2 * M), jnp.float32)
log("R:", R, "M:", M)

t0 = time.time()
y = dia_spmv_pallas(hyb.offsets, dv, xpad)
y.block_until_ready()
log(f"pallas standalone compile+run {time.time()-t0:.2f}s "
    f"checksum {float(y.sum()):.6e}")

# correctness vs numpy
dvn = np.asarray(hyb.dia_vals, np.float32)
xn = np.ones((16, R + 2 * M), np.float32)
yref = np.zeros((16, R), np.float32)
for k, off in enumerate(hyb.offsets):
    yref += dvn[:, k, :] * xn[:, M + off: M + off + R]
log("max err:", float(np.abs(np.asarray(y) - yref).max()))

# timing via repeated dispatch (block each call; includes ~25-30ms dispatch)
for _ in range(2):
    t0 = time.perf_counter()
    for _ in range(20):
        y = dia_spmv_pallas(hyb.offsets, dv, xpad)
    y.block_until_ready()
    dt = (time.perf_counter() - t0) / 20
log(f"pallas per-call (pipelined batch of 20): {dt*1e6:.1f}us "
    f"nnz/s={nnz/dt:.3e}")
log("DONE")
