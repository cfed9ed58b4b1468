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


if __name__ == "__main__":
    print(f"{'devices':>8} {'rows/dev':>9} {'rounds':>6} {'halo KB':>8} "
          f"{'compute us':>10} {'comm us':>8} {'eff(ovl)':>8} {'eff(ser)':>8}")
    for n1d, S in [(512, 4), (1024, 16), (2048, 64)]:
        m = model(n1d, S)
        print(f"{S:>8} {m['rows_per_dev']:>9} {m['rounds']:>6} "
              f"{m['halo_kb']:>8.1f} {m['t_compute_us']:>10.1f} "
              f"{m['t_comm_us']:>8.1f} {m['efficiency_overlapped']:>8.2f} "
              f"{m['efficiency_serial']:>8.2f}")
