"""Native-TPU probe: general-graph free-running kernel at D=1 (self-ring).

Compiles and runs the edge-colored unstructured async kernel
(ops/async_ras_general.py) natively on the one v5e chip — all S ranks
folded on one device, every link a self-DMA, exercising the full Mosaic
path: dynamic ``.at[traced]`` ring-slot refs for remote DMA targets,
SMEM int32 link tables, one-hot MXU pack/unpack, dense batched CG.

Run in background (first compile may take minutes through the tunnel):
    python scripts/probe_async_general_tpu.py
"""

import sys
import time

import numpy as np


def main():
    import jax

    from schwarz_tpu.config import Partition, Settings
    from schwarz_tpu.core.partition import make_partition
    from schwarz_tpu.models.mtx import read_mtx
    from schwarz_tpu.models.rhs import generate_rhs
    from schwarz_tpu.ops.async_ras_general import AsyncGeneralRASolver

    print("devices:", jax.devices(), file=sys.stderr)
    A = read_mtx("/root/reference/matrices/ani3_crop.mtx")
    b = generate_rhs(A.n, random=False)
    part = make_partition(A, 4, Settings(partition=Partition.metis))
    t0 = time.perf_counter()
    s = AsyncGeneralRASolver(
        A, b, 4, overlap=2, tolerance=1e-3, staleness=1, ninner=24,
        chunk_rounds=8, part=part, interpret=False,
    )
    print(f"setup {time.perf_counter() - t0:.1f}s; plan Rint={s.plan.Rint} "
          f"H={s.plan.H} SEG={s.plan.SEG} C={s.plan.C} D={s.D} Sl={s.Sl}",
          file=sys.stderr)
    t0 = time.perf_counter()
    sol, info = s.run(max_rounds=400)
    print(f"run {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    print({k: info[k] for k in ("done_at", "converged",
                                "relative_residual_norm", "rounds")})


if __name__ == "__main__":
    main()
