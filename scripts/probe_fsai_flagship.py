#!/usr/bin/env python
"""TPU probe: FSAI(0) local preconditioning at the flagship 1M-row/1e-8 size.

The flagship record (scripts/probe_spectral_flagship.py, BENCHMARKING.md):
1024^2 Poisson, 16 regular-2D subdomains, spectral coarse q=64, f64 outer /
f32 inner (iterative refinement), block-Jacobi-32 CG locals capped at 30 /
ltol 1e-2, stationary run(chunk_iters=40) -> 27 outers / 6.6 s warm.

FSAI competes on local-solve quality per FLOP: two banded SpMVs per apply
(gather-free DIA shifts) vs the block-diag matmul.  Sweep the inner cap —
a stronger approximate inverse should tolerate a tighter cap (measured on
CPU at 64^2/16 cap-6: 393 jacobi -> 286 bj -> 168 fsai outers).

Run on the TPU (default env), one process at a time:
    python scripts/probe_fsai_flagship.py
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
    # record config re-run (cache-warm sanity + the baseline to beat)
    run_config(A, b, base, "bj32 cap=30 (record)")
    for cap in (30, 15, 8):
        run_config(
            A, b,
            base.replace(precond=Precond.fsai, local_max_iters=cap),
            f"fsai cap={cap}",
        )
