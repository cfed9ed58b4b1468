#!/usr/bin/env python
"""FGMRES with an inexact (two-stage) RAS preconditioner on TPU — cheap
preconditioner applies x low iteration count."""
import time

import jax

from schwarz_tpu import Settings, generate_rhs, laplacian_2d
from schwarz_tpu.config import Partition, Precond
from schwarz_tpu.core.decompose import decompose
from schwarz_tpu.ras import RASolver


def log(*a):
    print(*a, flush=True)


log("devices:", jax.devices())
A = laplacian_2d(128)
b = generate_rhs(A.n)
s = Settings(
    partition=Partition.regular2d, overlap=6, tolerance=1e-4, max_iters=500,
    dtype="float32", local_tolerance=1e-2, local_max_iters=30,
    restart_iter=40,
    precond=Precond.block_jacobi, block_jacobi_block_size=32,
    row_pad_multiple=128, two_level=True,
)
solver = RASolver(decompose(A, b, s, 16))
t0 = time.time()
r1 = solver.run_accelerated()
log(f"fgmres(two-stage) compile+run {time.time()-t0:.1f}s")
r2 = solver.run_accelerated()
log(f"fgmres(two-stage): converged={r2.converged} iters={r2.iters} "
    f"rel={r2.relative_residual_norm:.2e} time={r2.solve_time_s:.3f}s")
log("DONE")
