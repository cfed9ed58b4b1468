#!/usr/bin/env python
"""Analytic multi-chip scaling model from the decomposition plan.

Only one TPU chip is reachable in this environment, so multi-chip scaling is
projected from measured single-chip throughput plus the plan's exact
per-device communication volumes (the same quantities the reference's
comm-volume instrument reports, bench_base.hpp:178-216).

Model: per outer iteration and device,
  compute time  = (SpMV applications) * bytes_spmv / HBM_BW
  comm time     = halo bytes (neighbor strategy, cyclic rounds) / ICI_BW
Weak scaling keeps a fixed subdomain size per device; with enable_overlap the
halo transfer overlaps the local solve, so efficiency ~ compute/(max(compute,
comm)).
"""

import numpy as np

from schwarz_tpu import Settings, generate_rhs, laplacian_2d
from schwarz_tpu.core.decompose import decompose
from schwarz_tpu.parallel.neighbor_exchange import build_neighbor_plan

HBM_BW = 819e9          # v5e
ICI_BW = 2 * 45e9       # v5e per-direction ICI link bandwidth, both axes used
MEASURED_SPMV_FRAC = 1.0    # measured: the corrected bench hits the HBM roofline (BENCHMARKING.md)
CG_ITERS = 30           # typical inner iterations per outer (block-Jacobi CG)


def model(n1d: int, S: int):
    A = laplacian_2d(n1d)
    b = generate_rhs(A.n, random=False)
    dec = decompose(A, b, Settings(overlap=6, dtype="float32",
                                   row_pad_multiple=128), S)
    nx = build_neighbor_plan(dec, S)   # one subdomain per device
    K = 5
    R = dec.meta.max_rows
    bytes_spmv = (K * R * 4 * 2 + R * 4)          # diagonals + x reads + write
    t_compute = CG_ITERS * bytes_spmv / (HBM_BW * MEASURED_SPMV_FRAC)
    # per-device halo bytes per iteration: max over devices of sent elements
    per_dev_sent = np.zeros(S)
    for k, tbl in enumerate(nx.send_idx):
        per_dev_sent += (tbl != 0).sum(axis=1) + 1
    halo_bytes = float(per_dev_sent.max()) * 4
    t_comm = halo_bytes / ICI_BW + len(nx.offsets) * 1e-6  # + per-round latency
    eff_overlap = t_compute / max(t_compute, t_comm)
    eff_serial = t_compute / (t_compute + t_comm)
    return dict(
        rows_per_dev=R, rounds=len(nx.offsets),
        halo_kb=halo_bytes / 1e3,
        t_compute_us=t_compute * 1e6, t_comm_us=t_comm * 1e6,
        efficiency_overlapped=eff_overlap, efficiency_serial=eff_serial,
    )


VPU_FLOPS = 0.5e12      # v5e vector-unit f32 (the kernel is VMEM-resident)
ICI_LATENCY = 2e-6      # per one-sided DMA


def async_model(S: int, rows_per_dev: int = 2048, ninner: int = 10,
                oras: float = -0.8, measure: bool = True):
    """Free-running weak scaling: MEASURED algorithmic rounds (interpret
    kernel at a fixed per-device subdomain size) + analytic per-round time.

    Per round a device does ``ninner`` in-VMEM CG iterations (compute) and
    pushes two boundary strips + acks (one-sided DMAs that overlap the
    NEXT round's compute — the kernel never blocks on sends, only on the
    staleness-bound receive).  The asynchronous design removes the
    per-iteration barrier entirely, so per-round efficiency is
    compute-bound; total wall = rounds x round time, with rounds the
    measured algorithmic quantity.
    """
    import math

    from schwarz_tpu.ops.async_ras import AsyncRASolver

    n = int(round(math.sqrt(rows_per_dev * S)))
    A = laplacian_2d(n)
    b = generate_rhs(A.n, random=False)
    rounds = rounds_2l = None
    if measure:
        s = AsyncRASolver(A, b, num_subdomains=S, overlap=2, tolerance=3e-3,
                          staleness=1, ninner=ninner, chunk_rounds=8,
                          interpret=True, oras_weight=oras)
        _, info = s.run(max_rounds=2400)
        rounds = int(info["rounds"]) if info["converged"] else -1
        # two-level asynchronous Schwarz (spectral coarse corrections at
        # the refinement restarts): the coarse space bounds the round
        # growth the one-level method suffers as the diameter grows.
        # Tuned recipe (measured at S=8: 512 -> 64 rounds vs q=8/tight):
        # strong per-subdomain coarse space (q=32), LOOSE in-band
        # tolerance (1e-1 — the kernel only contracts high-frequency
        # error between coarse solves), restarts every 16 rounds.
        s2 = AsyncRASolver(A, b, num_subdomains=S, overlap=2, tolerance=1e-1,
                           staleness=1, ninner=ninner, chunk_rounds=16,
                           interpret=True, oras_weight=oras)
        _, info2 = s2.run_refined(tol=3e-3, max_rounds=2400, coarse_q=32)
        rounds_2l = int(info2["rounds"]) if info2["converged"] else -1
        plan = s.plan
    else:
        from schwarz_tpu.ops.async_ras import build_async_plan

        plan = build_async_plan(A, b, S, 2, oras_weight=oras)
    K = len(plan.offsets)
    elems = plan.total          # one window per device here (Sl = 1)
    flops_round = ninner * (2 * K + 8) * elems
    t_compute = flops_round / VPU_FLOPS
    msg_bytes = (plan.hw + 8 * 128) * 4
    t_comm = 2 * (msg_bytes / ICI_BW + ICI_LATENCY)   # overlapped w/ compute
    return dict(
        n=n, rows_per_dev=plan.R, rounds=rounds, rounds_two_level=rounds_2l,
        round_compute_us=t_compute * 1e6, round_comm_us=t_comm * 1e6,
        msg_kb=msg_bytes / 1e3,
        projected_wall_ms=(
            rounds_2l * max(t_compute, t_comm) * 1e3
            if rounds_2l and rounds_2l > 0 else float("nan")
        ),
    )


if __name__ == "__main__":
    print(f"{'devices':>8} {'rows/dev':>9} {'rounds':>6} {'halo KB':>8} "
          f"{'compute us':>10} {'comm us':>8} {'eff(ovl)':>8} {'eff(ser)':>8}")
    for n1d, S in [(512, 4), (1024, 16), (2048, 64)]:
        m = model(n1d, S)
        print(f"{S:>8} {m['rows_per_dev']:>9} {m['rounds']:>6} "
              f"{m['halo_kb']:>8.1f} {m['t_compute_us']:>10.1f} "
              f"{m['t_comm_us']:>8.1f} {m['efficiency_overlapped']:>8.2f} "
              f"{m['efficiency_serial']:>8.2f}")
    print()
    print("free-running async weak scaling (measured rounds at fixed "
          "rows/dev, O-RAS c=-0.8, tol 3e-3; one-level vs two-level "
          "restart mode; analytic per-round costs):")
    print(f"{'devices':>8} {'rows/dev':>9} {'rounds1L':>8} {'rounds2L':>8} "
          f"{'msg KB':>7} {'compute us/rd':>13} {'comm us/rd':>10} "
          f"{'proj ms (2L)':>12}")
    for S in (2, 4, 8):
        m = async_model(S)
        print(f"{S:>8} {m['rows_per_dev']:>9} {m['rounds']:>8} "
              f"{m['rounds_two_level']:>8} {m['msg_kb']:>7.1f} "
              f"{m['round_compute_us']:>13.1f} {m['round_comm_us']:>10.1f} "
              f"{m['projected_wall_ms']:>12.1f}")
