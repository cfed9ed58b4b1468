#!/usr/bin/env python
"""Dense-Cholesky RAS preconditioner under FGMRES on TPU: MXU trisolves
instead of CG inner chains."""
import time

import jax

from schwarz_tpu import Settings, generate_rhs, laplacian_2d
from schwarz_tpu.config import LocalSolver, Partition
from schwarz_tpu.core.decompose import decompose
from schwarz_tpu.ras import RASolver


def log(*a):
    print(*a, flush=True)


log("devices:", jax.devices())
A = laplacian_2d(128)
b = generate_rhs(A.n)
s = Settings(
    partition=Partition.regular2d, overlap=6, tolerance=1e-4, max_iters=200,
    dtype="float32", restart_iter=40,
    local_solver=LocalSolver.direct_cholesky,
    row_pad_multiple=128, two_level=True,
)
t0 = time.time()
solver = RASolver(decompose(A, b, s, 16))
log(f"setup+factorization {time.time()-t0:.1f}s")
t0 = time.time()
r1 = solver.run_accelerated()
log(f"fgmres+cholesky compile+run {time.time()-t0:.1f}s")
r2 = solver.run_accelerated()
log(f"fgmres+cholesky: converged={r2.converged} iters={r2.iters} "
    f"rel={r2.relative_residual_norm:.2e} time={r2.solve_time_s:.3f}s")
# stationary with cholesky for comparison
r3 = solver.run(chunk_iters=100)
r3 = solver.run(chunk_iters=100)
log(f"stationary+cholesky: converged={r3.converged} iters={r3.iters} "
    f"rel={r3.relative_residual_norm:.2e} time={r3.solve_time_s:.3f}s")
log("DONE")
