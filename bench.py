#!/usr/bin/env python
"""Benchmark driver: prints ONE JSON line
``{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}``.

Headline metric (BASELINE.md targets): sustained batched local-operator SpMV
throughput in nnz/s on one chip over the decomposed RAS operator of a 1M-row
2D Laplacian —
the dominant kernel of the solver loop (every CG step is one SpMV; cf.
SURVEY.md §6 "nnz/s per chip" north star).  The operator runs in the DIA
(sorted-closure banded) formulation (ops/dia.py); the measurement is a
*serialized* chain inside one jitted while_loop with a traced rep count (each
iteration consumes the previous result, so dispatch pipelining cannot overlap
iterations, and one compile serves all measurements).

``vs_baseline`` is the fraction of the HBM-bandwidth speed-of-light model for
the chip (the reference repo ships no numbers — BASELINE.md: "no benchmark
numbers are stored"): bytes = diagonal values + shifted x reads + output
write.  1.0 == roofline.

Also measured and reported on stderr: full RAS time-to-solution + iteration
count on a 2D Poisson problem (regular-2D blocks, block-Jacobi preconditioned
CG, two-level coarse correction, chunked execution).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

# Wall-clock guard: remote TPU compiles can take many minutes for new shapes.
# The measurement runs in a child process; on timeout we fall back to smaller
# shapes (which compile quickly) so the driver always gets its JSON line.
INNER_TIMEOUT_S = int(os.environ.get("BENCH_TIMEOUT_S", "1500"))
T_START = time.time()


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from schwarz_tpu import Settings, generate_rhs, laplacian_2d
    from schwarz_tpu.config import Precond
    from schwarz_tpu.core.decompose import decompose
    from schwarz_tpu.ops.spmv import ell_spmv_batched
    from schwarz_tpu.ras import RASolver

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    dtype = "float32"
    small = "--small" in sys.argv

    # ---- headline: batched ELL SpMV nnz/s on the decomposed 1M-row operator ----
    n1d = (512 if small else 1024) if on_tpu else 192
    S = 16
    settings = Settings(overlap=3, dtype=dtype, row_pad_multiple=128)
    t0 = time.time()
    A = laplacian_2d(n1d)
    b = generate_rhs(A.n, random=False)
    dec = decompose(A, b, settings, S)
    setup_s = time.time() - t0

    from schwarz_tpu.ops.dia import dia_ell_spmv, split_dia_ell

    hyb = split_dia_ell(dec.lmat_vals, dec.lmat_cols, dec.rows_count)
    dia_vals = jnp.asarray(hyb.dia_vals, jnp.float32)
    rem_rows = jnp.asarray(hyb.rem_rows)
    rem_vals = jnp.asarray(hyb.rem_vals, jnp.float32)
    rem_cols = jnp.asarray(hyb.rem_cols)
    offsets = hyb.offsets
    nnz = int((dec.lmat_vals != 0).sum())
    R_rows = dec.meta.max_rows
    x0 = jnp.ones((S, dec.meta.max_ext), jnp.float32)

    use_pallas = False  # XLA shift formulation; see ras.py note on "auto"

    @jax.jit
    def chain(reps, x):
        # dynamic rep count: one compile serves warmup and measurement; the
        # chain is serialized (each iteration consumes the previous result)
        def cond(c):
            return c[0] < reps

        def body(c):
            i, xx = c
            y = dia_ell_spmv(
                offsets, dia_vals, rem_rows, rem_vals, rem_cols, xx,
                use_pallas=use_pallas,
            )
            return i + 1, xx.at[:, :R_rows].set(y * 1e-6 + 1.0)

        return jax.lax.while_loop(cond, body, (jnp.int32(0), x))[1]

    chain(jnp.int32(2), x0).block_until_ready()  # compile + warm
    reps = 400
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        chain(jnp.int32(reps), x0).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    dt = best / reps
    nnz_per_s = nnz / dt

    # speed-of-light model: stream the K diagonals (4 B) + K shifted reads of x
    # (4 B) + output write, remainder negligible
    K = len(offsets)
    bytes_per_iter = hyb.dia_vals.size * 4 + K * S * R_rows * 4 + S * R_rows * 4
    hbm_gbps = 819e9 if on_tpu else 100e9  # v5e HBM BW; nominal for CPU runs
    speed_of_light = nnz / (bytes_per_iter / hbm_gbps)
    vs_baseline = nnz_per_s / speed_of_light
    padded_nnz = hyb.dia_vals.size

    # headline first: a timeout during the informational RAS section must not
    # cost the driver its JSON line
    print(
        json.dumps(
            {
                "metric": "local_spmv_nnz_per_s_per_chip",
                "value": nnz_per_s,
                "unit": "nnz/s",
                "vs_baseline": vs_baseline,
            }
        ),
        flush=True,
    )

    # ---- secondary: RAS time-to-solution, paper-campaign two-stage config ------
    # informational (stderr only): skipped when the compile budget is half-spent
    def run_ras_secondary():
        # 128^2 converges to the 1e-4 f32 floor in ~115 iterations; larger
        # grids stall just above it (the floor grows with row count)
        n1d_ras = 128 if on_tpu else 64
        A2 = laplacian_2d(n1d_ras)
        b2 = generate_rhs(A2.n)
        from schwarz_tpu.config import Partition

        s2 = Settings(
            partition=Partition.regular2d,   # 4x4 blocks, not thin strips
            # f32 compute floors near 1e-4 relative residual (the reference's
            # 1e-6..1e-8 campaigns run in double; use dtype float64 for those)
            overlap=6, tolerance=1e-4, max_iters=500, dtype=dtype,
            local_tolerance=1e-6,
            # capped inexact local solves — the reference's own paper campaign
            # runs two-stage with liter=70 / ltol=0.1 (run_script:35-44);
            # measured sweep here: cap 20 gives 0.96 s vs 2.6 s uncapped at
            # identical final residual (BENCHMARKING.md)
            local_max_iters=20,
            precond=Precond.block_jacobi, block_jacobi_block_size=32,
            row_pad_multiple=128, two_level=True,
        )
        solver = RASolver(decompose(A2, b2, s2, S))
        # chunked: keeps each device execution well under the ~60s watchdog
        solver.run(chunk_iters=100)           # includes compile
        r2 = solver.run(chunk_iters=100)      # warm
        return {
            "ras_n": A2.n,
            "ras_converged": bool(r2.converged),
            "ras_iters": int(r2.iters),
            "ras_rel_residual": float(r2.relative_residual_norm),
            "ras_time_s": float(r2.solve_time_s),
        }

    elapsed = time.time() - T_START
    if elapsed > 0.5 * INNER_TIMEOUT_S:
        ras_info = {"ras_skipped": f"budget ({elapsed:.0f}s elapsed)"}
    else:
        try:
            ras_info = run_ras_secondary()
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
                "spmv_us": dt * 1e6,
                **ras_info,
            }
        ),
        file=sys.stderr,
    )


def guarded():
    """Run the measurement in a child with a timeout; fall back to --small."""
    for args in ([], ["--small"]):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--inner", *args],
                capture_output=True, text=True, timeout=INNER_TIMEOUT_S,
            )
            out, err, rc = proc.stdout, proc.stderr, proc.returncode
        except subprocess.TimeoutExpired as e:
            # the headline prints before the informational RAS section, so a
            # timeout there still leaves a valid stdout line to salvage
            out = (e.stdout or b"")
            if isinstance(out, bytes):
                out = out.decode(errors="replace")
            err = (e.stderr or b"")
            if isinstance(err, bytes):
                err = err.decode(errors="replace")
            rc = 0 if out.strip() else -1
            print(f"bench timed out ({args}); salvaging output", file=sys.stderr)
        sys.stderr.write(err)
        lines = [ln for ln in out.splitlines() if ln.strip()]
        if rc == 0 and lines:
            print(lines[-1])
            return 0
        print(f"bench child failed rc={rc} ({args})", file=sys.stderr)
    print(json.dumps({
        "metric": "local_spmv_nnz_per_s_per_chip",
        "value": 0.0, "unit": "nnz/s", "vs_baseline": 0.0,
    }))
    return 1


if __name__ == "__main__":
    if "--inner" in sys.argv:
        main()
    else:
        sys.exit(guarded())
