#!/usr/bin/env python
"""TPU probe: the 1M-row/1e-8 flagship through the FREE-RUNNING kernel.

The sync record (probe_spectral_flagship.py) is 6.6 s warm: stationary
two-level spectral q=64, each outer iteration streaming the operator from
HBM plus dispatch overhead.  The free-running kernel holds the ENTIRE
decomposed state in VMEM (16 windows x ~70k rows x f32 ~ 60 MB on a
128 MB v5e) and runs whole chunks of outer rounds per launch — per-round
cost is VPU-bound (~0.4 ms analytic), so if the tuned two-level restart
recipe needs O(100) rounds the async path could beat the sync record by
multiples.

Config: 1024^2 Poisson, 16 regular strips (the 1-D banded kernel's
layout), overlap 1 BFS level (= 1024 rows), O-RAS c=-0.8, loose 1e-1
in-band tolerance, spectral coarse q=64 at the refinement restarts,
f64 accuracy via iterative-refinement restarts to 1e-8.

Run on the TPU (default env), one process at a time; first compile of
the big kernel may take many minutes.
"""

import json
import time

import jax

from schwarz_tpu import generate_rhs, laplacian_2d
from schwarz_tpu.ops.async_ras import AsyncRASolver
from schwarz_tpu.parallel.mesh import make_mesh

if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    A = laplacian_2d(1024)
    b = generate_rhs(A.n)
    t0 = time.time()
    s = AsyncRASolver(
        A, b, num_subdomains=16, overlap=1, tolerance=1e-1,
        staleness=1, ninner=10, chunk_rounds=16,
        mesh=make_mesh(jax.devices()[:1]), interpret=False,
        oras_weight=-0.8,
    )
    setup_s = time.time() - t0
    p = s.plan
    vmem_mb = (p.S * p.total * 4 * (len(p.offsets) + 9)) >> 20
    print(json.dumps({"setup_s": round(setup_s, 1), "R": p.R, "hw": p.hw,
                      "total": p.total, "est_vmem_mb": vmem_mb}), flush=True)
    # cold run (compile) — a short chunk bound
    t0 = time.time()
    _, info0 = s.run_refined(tol=1e-8, max_restarts=2, max_rounds=64,
                             coarse_q=64)
    print(json.dumps({"cold_s": round(time.time() - t0, 1),
                      "cold_rounds": int(info0["rounds"]),
                      "cold_rel": float(info0["relative_residual_norm"])}),
          flush=True)
    # warm full solve to 1e-8
    t0 = time.time()
    x, info = s.run_refined(tol=1e-8, max_restarts=20, max_rounds=2000,
                            coarse_q=64)
    print(json.dumps({
        "warm_wall_s": round(time.time() - t0, 1),
        "rounds": int(info["rounds"]),
        "restarts": int(info.get("restarts", -1)),
        "converged": bool(info["converged"]),
        "rel": float(info["relative_residual_norm"]),
    }), flush=True)
