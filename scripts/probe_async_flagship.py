#!/usr/bin/env python
"""TPU probe: free-running vs synchronous RAS, single-chip head-to-head.

VMEM (~16 MiB/core on v5e) bounds the free-running kernel's resident
state, so the largest single-chip instance is ~150k rows (the 1M flagship
is a MULTI-CHIP async story: 16 chips x 65k rows/chip needs only ~4.5 MiB
each, validated on the virtual mesh / dryrun).  This probe runs the
largest VMEM-fitting problem both ways at 1e-8:

  - async: free-running kernel, O-RAS c=-0.8, two-level restarts
    (spectral coarse q=64 between launches, loose 1e-1 in-band tolerance
    — the tuned recipe; 256^2/16 interpret validation: 144 rounds,
    8 restarts, 1.05e-9),
  - sync: the stationary two-level spectral path (the flagship recipe of
    probe_spectral_flagship.py at this size).

Run on the TPU (default env), one process at a time; the async kernel's
first compile may take many minutes.
"""

import json
import time

import jax

from schwarz_tpu import Settings, generate_rhs, laplacian_2d
from schwarz_tpu.config import Partition, Precond
from schwarz_tpu.core.decompose import decompose
from schwarz_tpu.ops.async_ras import AsyncRASolver
from schwarz_tpu.parallel.mesh import make_mesh
from schwarz_tpu.ras import RASolver

N1D = 384          # 147k rows: ~9 MiB resident with 16 strip windows

if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    A = laplacian_2d(N1D)
    b = generate_rhs(A.n)

    # ---- async: free-running + two-level restarts -----------------------
    t0 = time.time()
    s = AsyncRASolver(
        A, b, num_subdomains=16, overlap=1, tolerance=1e-1,
        staleness=1, ninner=10, chunk_rounds=16,
        mesh=make_mesh(jax.devices()[:1]), interpret=False,
        oras_weight=-0.8,
    )
    setup_s = time.time() - t0
    print(json.dumps({"async_setup_s": round(setup_s, 1), "R": s.plan.R,
                      "total": s.plan.total}), flush=True)
    t0 = time.time()
    _, info0 = s.run_refined(tol=1e-8, max_restarts=2, max_rounds=64,
                             coarse_q=64)
    print(json.dumps({"async_cold_s": round(time.time() - t0, 1)}),
          flush=True)
    t0 = time.time()
    x, info = s.run_refined(tol=1e-8, max_restarts=20, max_rounds=2000,
                            coarse_q=64)
    print(json.dumps({
        "async_warm_s": round(time.time() - t0, 1),
        "rounds": int(info["rounds"]),
        "restarts": int(info.get("restarts", -1)),
        "converged": bool(info["converged"]),
        "rel": float(info["relative_residual_norm"]),
    }), flush=True)

    # ---- sync: stationary two-level spectral (flagship recipe) ----------
    t0 = time.time()
    s2 = Settings(
        partition=Partition.regular2d, overlap=6, tolerance=1e-8,
        max_iters=3000, dtype="float64", local_compute_dtype="float32",
        local_tolerance=1e-2, local_max_iters=30,
        precond=Precond.block_jacobi, block_jacobi_block_size=32,
        row_pad_multiple=128, two_level=True, coarse_space="spectral",
        coarse_aggregates=64,
    )
    solver = RASolver(decompose(A, b, s2, 16))
    sync_setup = time.time() - t0
    solver.run(chunk_iters=40)
    t0 = time.time()
    r = solver.run(chunk_iters=40)
    print(json.dumps({
        "sync_setup_s": round(sync_setup, 1),
        "sync_warm_s": round(time.time() - t0, 1),
        "sync_iters": int(r.iters), "sync_converged": bool(r.converged),
        "sync_rel": float(r.relative_residual_norm),
    }), flush=True)
