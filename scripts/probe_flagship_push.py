#!/usr/bin/env python
"""TPU probe: push the 1M-row/1e-8 flagship record past q=64.

Current record (scripts/probe_spectral_flagship.py, BENCHMARKING.md):
spectral q=64, overlap 6, bj32 cap-30 locals -> 27 outers / 6.6 s warm.
The q-sweep 16->32->64 halved iterations each doubling (77->42->27), so
q=96/128 may keep paying; the counterweights are the per-subdomain setup
eigendecomposition and the (qS)-sized replicated coarse solve growing.
Also probes overlap 8 (fewer outers per BENCHMARKING's O-RAS table logic)
and the coarse-aware O-RAS weight c=-0.6 at q=64.

Run on the TPU (default env), one process at a time:
    python scripts/probe_flagship_push.py
"""

import json
import time

import jax

from schwarz_tpu import Settings, generate_rhs, laplacian_2d
from schwarz_tpu.config import Partition, Precond
from schwarz_tpu.core.decompose import decompose
from schwarz_tpu.ras import RASolver


def run_config(A, b, s, tag, chunk=40):
    t0 = time.time()
    solver = RASolver(decompose(A, b, s, 16))
    setup_s = time.time() - t0
    solver.run(chunk_iters=chunk)          # cold (compile)
    t0 = time.time()
    r = solver.run(chunk_iters=chunk)      # warm
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
        coarse_aggregates=64,
    )
    for q in (96, 128):
        run_config(A, b, base.replace(coarse_aggregates=q), f"q={q} ov=6")
    run_config(A, b, base.replace(overlap=8), "q=64 ov=8")
    run_config(A, b, base.replace(oras_weight=-0.6), "q=64 oras=-0.6")
