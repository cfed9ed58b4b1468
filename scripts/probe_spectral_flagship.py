"""TPU probe: can stationary RAS + the spectral coarse space beat the
FGMRES flagship record (1M-row Laplacian to 1e-8; 190 iters / 30.9 s warm,
BENCHMARKING.md) on one v5e chip?

Run (default axon TPU env, background, generous timeout — cold remote
compiles take minutes): python scripts/probe_spectral_flagship.py
"""

import json
import time

import jax

from schwarz_tpu import Settings, generate_rhs, laplacian_2d
from schwarz_tpu.config import Partition, Precond
from schwarz_tpu.core.decompose import decompose
from schwarz_tpu.ras import RASolver

S = 16


def run_config(A, b, s, tag, accel, chunk):
    t0 = time.time()
    dec = decompose(A, b, s, S)
    solver = RASolver(dec)
    setup_s = time.time() - t0
    for attempt in ("cold", "warm"):
        t0 = time.time()
        if accel:
            r = solver.run_accelerated(chunk_iters=chunk)
        else:
            r = solver.run(chunk_iters=chunk)
        wall = time.time() - t0
        print(json.dumps({
            "tag": tag, "attempt": attempt, "setup_s": round(setup_s, 1),
            "iters": int(r.iters), "converged": bool(r.converged),
            "rel": float(r.relative_residual_norm),
            "wall_s": round(wall, 1),
        }), flush=True)
    return r


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    A = laplacian_2d(1024)
    b = generate_rhs(A.n)
    base = Settings(
        partition=Partition.regular2d, overlap=6, tolerance=1e-8,
        max_iters=3000, dtype="float64", local_compute_dtype="float32",
        local_tolerance=1e-2, local_max_iters=30,
        precond=Precond.block_jacobi, block_jacobi_block_size=32,
        row_pad_multiple=128, two_level=True,
    )
    # candidate: stationary + spectral coarse q=16
    run_config(A, b, base.replace(coarse_space="spectral",
                                  coarse_aggregates=16),
               "stationary spectral q=16", accel=False, chunk=40)
    # candidate: fgmres + spectral coarse q=16 (record config had q=1 aggs)
    run_config(A, b, base.replace(coarse_space="spectral",
                                  coarse_aggregates=16,
                                  accelerator="fgmres", restart_iter=40),
               "fgmres spectral q=16", accel=True, chunk=40)
