#!/usr/bin/env python
"""Benchmark driver: prints ONE JSON line
``{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}``.

Headline metric (BASELINE.md targets): sustained batched ELL SpMV throughput in
nnz/s on one chip over the decomposed RAS operator of a 1M-row 2D Laplacian —
the dominant kernel of the solver loop (every CG step is one SpMV; cf.
SURVEY.md §6 "nnz/s per chip" north star).  ``vs_baseline`` is the fraction of
the memory-bandwidth speed-of-light for the chip (the reference repo ships no
numbers, BASELINE.md: "no benchmark numbers are stored"), so 1.0 == HBM roofline.

Also measured and reported on stderr: full RAS time-to-solution + iteration
count on a 2D Poisson problem (reference smoke config, run_bench:1).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from schwarz_tpu import Settings, generate_rhs, laplacian_2d
    from schwarz_tpu.core.decompose import decompose
    from schwarz_tpu.ops.spmv import ell_spmv_batched
    from schwarz_tpu.ras import RASolver

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    dtype = "float32"

    # ---- headline: batched ELL SpMV nnz/s on the decomposed 1M-row operator ----
    n1d = 1024 if on_tpu else 192
    S = 16
    settings = Settings(overlap=3, dtype=dtype, row_pad_multiple=128)
    t0 = time.time()
    A = laplacian_2d(n1d)
    b = generate_rhs(A.n, random=False)
    dec = decompose(A, b, settings, S)
    setup_s = time.time() - t0

    vals = jnp.asarray(dec.lmat_vals, jnp.float32)
    cols = jnp.asarray(dec.lmat_cols)
    nnz = int((dec.lmat_vals != 0).sum())
    x = jnp.ones((S, dec.meta.max_ext), jnp.float32)

    spmv = jax.jit(lambda v, c, xx: ell_spmv_batched(v, c, xx[:, : dec.meta.max_rows]))
    spmv(vals, cols, x).block_until_ready()  # compile
    reps = 50
    t0 = time.perf_counter()
    y = None
    for _ in range(reps):
        y = spmv(vals, cols, x)
    y.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    nnz_per_s = nnz / dt

    # padded-ELL moves (4B val + 4B col + ~4B gathered x) per padded slot
    padded_nnz = int(np.prod(dec.lmat_vals.shape))
    bytes_per_iter = padded_nnz * 12
    hbm_gbps = 819e9 if on_tpu else 50e9  # v5e HBM BW; nominal for CPU runs
    speed_of_light = hbm_gbps / 12 * (nnz / padded_nnz)
    vs_baseline = nnz_per_s / speed_of_light

    # ---- secondary: RAS time-to-solution (reference smoke config scaled up) ----
    ras_info = {}
    try:
        n1d_ras = 256 if on_tpu else 64
        A2 = laplacian_2d(n1d_ras)
        b2 = generate_rhs(A2.n)
        s2 = Settings(overlap=4, tolerance=1e-6, max_iters=100, dtype=dtype,
                      local_tolerance=1e-8)
        dec2 = decompose(A2, b2, s2, S)
        solver = RASolver(dec2)
        r = solver.run()       # includes compile
        r2 = solver.run()      # warm
        ras_info = {
            "ras_n": A2.n,
            "ras_converged": bool(r2.converged),
            "ras_iters": int(r2.iters),
            "ras_rel_residual": float(r2.relative_residual_norm),
            "ras_time_s": float(r2.solve_time_s),
        }
    except Exception as e:  # pragma: no cover
        ras_info = {"ras_error": str(e)}

    print(
        json.dumps(
            {
                "device": str(dev),
                "n": A.n,
                "nnz": nnz,
                "padded_nnz": padded_nnz,
                "setup_s": setup_s,
                "spmv_ms": dt * 1e3,
                "bytes_per_iter": bytes_per_iter,
                **ras_info,
            }
        ),
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "ell_spmv_nnz_per_s_per_chip",
                "value": nnz_per_s,
                "unit": "nnz/s",
                "vs_baseline": vs_baseline,
            }
        )
    )


if __name__ == "__main__":
    main()
