"""TPU probe round 2: tune the stationary + spectral flagship
(q, inner cap).  Baseline from round 1 probe: q=16 cap=30 -> 77 iters,
13.4 s warm."""

import json
import time

import jax

from schwarz_tpu import Settings, generate_rhs, laplacian_2d
from schwarz_tpu.config import Partition, Precond
from schwarz_tpu.core.decompose import decompose
from schwarz_tpu.ras import RASolver

S = 16


def run_config(A, b, s, tag, chunk=40):
    t0 = time.time()
    solver = RASolver(decompose(A, b, s, S))
    setup_s = time.time() - t0
    solver.run(chunk_iters=chunk)
    t0 = time.time()
    r = solver.run(chunk_iters=chunk)
    print(json.dumps({
        "tag": tag, "setup_s": round(setup_s, 1), "iters": int(r.iters),
        "converged": bool(r.converged),
        "rel": float(r.relative_residual_norm),
        "warm_wall_s": round(time.time() - t0, 1),
    }), flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    A = laplacian_2d(1024)
    b = generate_rhs(A.n)
    base = Settings(
        partition=Partition.regular2d, overlap=6, tolerance=1e-8,
        max_iters=3000, dtype="float64", local_compute_dtype="float32",
        local_tolerance=1e-2, local_max_iters=30,
        precond=Precond.block_jacobi, block_jacobi_block_size=32,
        row_pad_multiple=128, two_level=True, coarse_space="spectral",
    )
    run_config(A, b, base.replace(coarse_aggregates=32), "q=32 cap=30")
    run_config(A, b, base.replace(coarse_aggregates=16, local_max_iters=20),
               "q=16 cap=20")
    run_config(A, b, base.replace(coarse_aggregates=64), "q=64 cap=30")
