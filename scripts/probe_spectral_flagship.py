"""TPU probe: the 1M-row/1e-8 flagship through the spectral coarse space.

Stationary two-level RAS + spectral coarse vs the FGMRES record.  Measured
on v5e (2026-08-17): stationary q=16 77 its / 13.4 s, q=32 42 its / 8.8 s,
q=64 27 its / 6.6 s warm (cap=20 regresses: 113 its / 15.8 s); FGMRES +
spectral q=16 45 its / 32.9 s.  Previous records: fgmres+aggregates
190 its / 30.9 s (round 2), 61.7 s (round 1), one-level stationary 376 s.

Run (default axon TPU env, background; cold remote compiles take minutes):
    python scripts/probe_spectral_flagship.py
"""

import json
import time

import jax

from schwarz_tpu import Settings, generate_rhs, laplacian_2d
from schwarz_tpu.config import Partition, Precond
from schwarz_tpu.core.decompose import decompose
from schwarz_tpu.ras import RASolver

S = 16


def run_config(A, b, s, tag, accel=False, chunk=40):
    t0 = time.time()
    solver = RASolver(decompose(A, b, s, S))
    setup_s = time.time() - t0
    run = solver.run_accelerated if accel else solver.run
    run(chunk_iters=chunk)                 # cold (compile)
    t0 = time.time()
    r = run(chunk_iters=chunk)             # warm
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
    for q in (16, 32, 64):
        run_config(A, b, base.replace(coarse_aggregates=q), f"q={q} cap=30")
    run_config(A, b, base.replace(coarse_aggregates=64,
                                  accelerator="fgmres", restart_iter=40),
               "fgmres q=64", accel=True)
