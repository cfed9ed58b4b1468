#!/usr/bin/env python
"""Configuration-sweep campaign driver — the TPU-era equivalent of the
reference's LSF job-generation scripts (L6: run_script:6-56 sweeps comm
paradigms/convergence settings over `bsub`; here one process sweeps solver
configurations over the local device mesh and writes a CSV).

    python scripts/campaign.py [--n 64] [--subdomains 8] [--out campaign.csv]
"""

from __future__ import annotations

import argparse
import csv
import itertools
import sys

from schwarz_tpu import (
    CommSettings,
    GlobalConvergence,
    HaloStrategy,
    LocalSolver,
    Partition,
    Settings,
    generate_rhs,
    laplacian_2d,
    solve,
)
from schwarz_tpu.config import ConvergenceSettings, Precond


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=48, help="grid side")
    ap.add_argument("--subdomains", type=int, default=8)
    ap.add_argument("--out", default="campaign.csv")
    ap.add_argument("--tol", type=float, default=1e-6)
    args = ap.parse_args(argv)

    A = laplacian_2d(args.n)
    b = generate_rhs(A.n)

    # the reference campaign's axes (run_script): comm paradigm x convergence
    # detection x local solver — plus our beyond-reference axes
    axes = {
        "partition": [Partition.regular, Partition.regular2d, Partition.metis],
        # free_running = the TRUE asynchronous mode (multi-iteration Pallas
        # kernel; the reference campaign's event/onesided paradigm axis)
        "mode": ["twosided", "onesided", "free_running"],
        "strategy": [HaloStrategy.all_gather, HaloStrategy.neighbor],
        "accel": ["none", "fgmres"],
        # O-RAS Robin transmission: classical vs the coarse-space-aware
        # "auto" weight (sync paths AND the free-running kernels)
        "oras": [0.0, "auto"],
    }
    conv_for_mode = {
        "twosided": GlobalConvergence.allgather,
        "onesided": GlobalConvergence.decentralized,
    }

    rows = []
    for partition, mode, strategy, accel, oras in itertools.product(
        *axes.values()
    ):
        if partition == Partition.regular2d and args.subdomains not in (4, 16):
            continue
        if mode == "onesided" and accel == "fgmres":
            continue  # acceleration presumes synchronous preconditioning
        if mode == "free_running":
            # one axis point per partition (strategy/accel are meaningless
            # inside the kernel and rejected loudly by the dispatch)
            if strategy != HaloStrategy.all_gather or accel != "none":
                continue
        if mode == "free_running":
            s = Settings(
                partition=partition, overlap=4, tolerance=args.tol,
                max_iters=500, local_max_iters=20, free_running=True,
                oras_weight=oras,
                comm=CommSettings(staleness=1),
            )
        else:
            s = Settings(
                partition=partition,
                overlap=4,
                tolerance=args.tol,
                max_iters=500,
                precond=Precond.block_jacobi,
                block_jacobi_block_size=8,
                two_level=(accel == "none"),
                # the spectral (Neumann-block eigenvector) coarse space is
                # the strongest per coarse DOF (measured 117 -> 15 at
                # 128^2/16 vs equal-size aggregates); fgmres keeps q small
                coarse_aggregates=4 if accel == "none" else 1,
                coarse_space="spectral" if accel == "none" else "aggregates",
                accelerator=accel,
                oras_weight=oras,
                comm=CommSettings(
                    onesided=(mode == "onesided"),
                    staleness=1 if mode == "onesided" else 0,
                    strategy=strategy,
                ),
                convergence=ConvergenceSettings(method=conv_for_mode[mode]),
            )
        try:
            r = solve(A, b, s, num_subdomains=args.subdomains)
            rows.append({
                "partition": partition.value, "mode": mode,
                "strategy": strategy.value, "accelerator": accel,
                "oras": oras,
                "converged": r.converged, "iters": r.iters,
                "rel_residual": f"{r.relative_residual_norm:.3e}",
                "time_s": f"{r.solve_time_s:.3f}",
            })
        except Exception as e:
            rows.append({
                "partition": partition.value, "mode": mode,
                "strategy": strategy.value, "accelerator": accel,
                "oras": oras,
                "converged": False, "iters": -1,
                "rel_residual": f"error: {e}", "time_s": "",
            })
        print(rows[-1], file=sys.stderr, flush=True)

    with open(args.out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {len(rows)} rows to {args.out}")


if __name__ == "__main__":
    main()
