#!/usr/bin/env python
"""Benchmark driver: prints ONE JSON line
``{"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}``.

Headline metric (BASELINE.md targets): sustained batched local-operator SpMV
throughput in nnz/s on one chip over the decomposed RAS operator of a 1M-row
2D Laplacian — the dominant kernel of the solver loop (every CG step is one
SpMV; cf. SURVEY.md §6 "nnz/s per chip" north star).  The operator runs in
the DIA (sorted-closure banded) formulation (ops/dia.py).

Measurement methodology: a *serialized* chain inside one jitted while_loop
with a traced rep count (each iteration consumes the previous result, so
dispatch pipelining cannot overlap iterations, and one compile serves all
measurements).  The chain carries a feedback copy that is NOT part of the
operator; its cost is measured separately with a no-op chain of identical
feedback structure and subtracted, so the headline measures the pure
operator (round-1 verdict: report the operator honestly, not the harness).

``vs_baseline`` is the fraction of the HBM-bandwidth speed-of-light model
for the chip (the reference repo ships no numbers — BASELINE.md: "no
benchmark numbers are stored"): bytes = diagonal values + shifted x reads +
output write.  1.0 == roofline.

The same JSON line also carries the two other BASELINE.md per-chip metrics:
  - ``trisolve_nnz_per_s`` / ``trisolve_vs_roofline``: batched dense
    triangular solve (the direct local-solve hot path, solvers/direct.py),
    measured on the blocked MXU panel substitution (direct_apply='blocked');
    the plain XLA scalar substitution is reported separately as
    ``trisolve_xla_elems_per_s``.  Roofline = streaming both triangular
    factors from HBM once per solve.
  - ``halo_gather_scatter_elems_per_s`` / ``halo_vs_roofline``: the halo
    pack/unpack path (parallel/exchange.py) — the contiguous-run vector-copy
    assembly when the RunPlan engages (the production path; the element-wise
    gather fallback is reported separately); roofline = 8 B/element
    (value read + value write) at HBM bandwidth.

Also measured and reported on stderr: full RAS time-to-solution + iteration
count on a 2D Poisson problem, and a native (non-interpret) compile check of
the Pallas RDMA remote-copy kernel at D=1.
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


def _chain_time(jitted_chain, x0, reps=400, tries=3, warm_reps=2):
    """Best-of-N per-iteration time of a serialized jitted chain."""
    import jax.numpy as jnp

    jitted_chain(jnp.int32(warm_reps), x0)[1].block_until_ready()
    best = float("inf")
    for _ in range(tries):
        t0 = time.perf_counter()
        jitted_chain(jnp.int32(reps), x0)[1].block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best / reps


def _make_chain(step):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chain(reps, x):
        def body(c):
            i, xx = c
            return i + 1, step(xx)

        return jax.lax.while_loop(lambda c: c[0] < reps, body,
                                  (jnp.int32(0), x))

    return chain


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from schwarz_tpu import Settings, generate_rhs, laplacian_2d
    from schwarz_tpu.config import Precond
    from schwarz_tpu.core.decompose import decompose
    from schwarz_tpu.ras import RASolver

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    dtype = "float32"
    small = "--small" in sys.argv
    hbm_gbps = 819e9 if on_tpu else 100e9  # v5e HBM BW; nominal for CPU runs

    # ---- headline: overhead-corrected DIA SpMV nnz/s, 1M-row operator ------
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

    def step_spmv(xx):
        y = dia_ell_spmv(offsets, dia_vals, rem_rows, rem_vals, rem_cols, xx,
                         use_pallas=use_pallas)
        return xx.at[:, :R_rows].set(y * 1e-6 + 1.0)

    def step_noop(xx):
        # identical feedback structure without the SpMV: measures the chain
        # harness (the feedback copy), subtracted from the full chain below
        y = xx[:, :R_rows] * 1.000001
        return xx.at[:, :R_rows].set(y * 1e-6 + 1.0)

    t_full = _chain_time(_make_chain(step_spmv), x0)
    t_base = _chain_time(_make_chain(step_noop), x0)
    t_spmv = max(t_full - t_base, 1e-12)
    nnz_per_s = nnz / t_spmv

    # speed-of-light model: stream the K diagonals (4 B) + K shifted reads of
    # x (4 B) + output write, remainder negligible
    K = len(offsets)
    bytes_per_iter = hyb.dia_vals.size * 4 + K * S * R_rows * 4 + S * R_rows * 4
    speed_of_light = nnz / (bytes_per_iter / hbm_gbps)
    vs_baseline = min(nnz_per_s / speed_of_light, 1.0)
    padded_nnz = hyb.dia_vals.size

    # ---- BASELINE.md metric 2: batched dense triangular solve --------------
    from schwarz_tpu.solvers.direct import cholesky_factor, cholesky_solve

    R_tri = (512 if small else 1024) if on_tpu else 256
    S_tri = 16
    A_t = laplacian_2d(int(np.sqrt(R_tri * S_tri)) // 4 * 4)
    b_t = generate_rhs(A_t.n, random=False)
    dec_t = decompose(
        A_t, b_t, Settings(overlap=2, dtype=dtype, row_pad_multiple=128),
        S_tri,
    )
    v_t = jnp.asarray(dec_t.lmat_vals, jnp.float32)
    c_t = jnp.asarray(dec_t.lmat_cols)
    L = jax.jit(cholesky_factor)(v_t, c_t)
    L.block_until_ready()
    R_fac = int(L.shape[-1])
    rhs0 = jnp.ones((S_tri, R_fac), jnp.float32)

    def step_tri(bb):
        x = cholesky_solve(L, bb)
        return x * 1e-6 + 1.0

    def step_tri_noop(bb):
        return bb * 1.000001 * 1e-6 + 1.0

    t_tri_full = _chain_time(_make_chain(step_tri), rhs0, reps=100)
    t_tri_base = _chain_time(_make_chain(step_tri_noop), rhs0, reps=100)
    t_tri = max(t_tri_full - t_tri_base, 1e-12)
    # both solves stream one triangular factor each: S * R*(R+1)/2 elements x2
    tri_elems = S_tri * R_fac * (R_fac + 1)  # lower + upper
    tri_sol = hbm_gbps / 4.0                 # elements/s streaming f32 factors
    trisolve_xla_elems_per_s = tri_elems / t_tri

    # production trisolve: blocked MXU panel substitution with pre-inverted
    # diagonal blocks (direct_apply='blocked') — factor conditioning kept,
    # scalar substitution replaced by matmuls
    from schwarz_tpu.solvers.direct import (
        block_diag_inverses,
        blocked_cholesky_solve,
        pick_trisolve_block,
    )

    blk = pick_trisolve_block(R_fac)
    Dinv_t = jax.jit(block_diag_inverses, static_argnums=1)(L, blk)
    Dinv_t.block_until_ready()

    def step_tri_blocked(bb):
        x = blocked_cholesky_solve(L, Dinv_t, bb)
        return x * 1e-6 + 1.0

    t_trib_full = _chain_time(_make_chain(step_tri_blocked), rhs0, reps=100)
    t_trib = max(t_trib_full - t_tri_base, 1e-12)
    trisolve_elems_per_s = tri_elems / t_trib
    trisolve_vs_roofline = min(trisolve_elems_per_s / tri_sol, 1.0)

    # recommended TPU direct path: explicit-inverse apply (one batched MXU
    # matmul per solve, Settings.direct_apply='inverse')
    from schwarz_tpu.solvers.direct import cholesky_inverse, inverse_apply

    Ainv = jax.jit(cholesky_inverse)(L)
    Ainv.block_until_ready()

    def step_inv(bb):
        return inverse_apply(Ainv, bb) * 1e-6 + 1.0

    t_inv_full = _chain_time(_make_chain(step_inv), rhs0, reps=100)
    t_inv = max(t_inv_full - t_tri_base, 1e-12)
    inv_elems = S_tri * R_fac * R_fac        # Ainv streamed once per apply
    inverse_elems_per_s = inv_elems / t_inv
    inverse_vs_roofline = min(inverse_elems_per_s / (hbm_gbps / 4.0), 1.0)

    # ---- BASELINE.md metric 3: halo gather/scatter --------------------------
    # the pack/unpack path of the exchange, measured on the 1M-row plan
    # (collective excluded at D=1).  The PRODUCTION path is the contiguous-
    # run assembly when the plan engages (exchange.RunPlan — exact-length
    # vector copies); the element-wise gather is also measured as the
    # fallback-path number.
    from schwarz_tpu.parallel.exchange import (
        assemble_x_ext,
        assemble_x_ext_runs,
        build_run_plan,
    )

    halo_slots = jnp.asarray(dec.halo_slots)
    halo_src = jnp.asarray(dec.halo_src_halo)
    interior_off = jnp.asarray(dec.interior_offset.astype(np.int32))
    R_int = dec.meta.max_interior
    R_ext = dec.meta.max_ext
    H = int(dec.halo_slots.shape[1])
    xo0 = jnp.ones((S, R_int), jnp.float32)

    def step_halo_gather(xo):
        halo_vals = xo.reshape(-1)[halo_src]
        x_ext = assemble_x_ext(xo, interior_off, halo_slots, halo_vals, R_ext)
        # full reduction keeps every scattered element live (no DCE of the
        # gather/scatter under test)
        return xo * 0.999999 + jnp.sum(x_ext, axis=1, keepdims=True) * 1e-12

    def step_halo_noop(xo):
        return xo * 0.999999 + jnp.sum(
            jnp.pad(xo, ((0, 0), (0, R_ext - R_int))), axis=1, keepdims=True
        ) * 1e-12

    rp = build_run_plan(
        dec.halo_src_halo, dec.halo_slots, R_ext, R_int,
        dec.interior_offset,
    )
    if rp is not None:
        rs = tuple(jnp.asarray(t) for t in rp.run_src)
        rd = tuple(jnp.asarray(t) for t in rp.run_dst)

        def step_halo(xo):
            x_ext = assemble_x_ext_runs(
                xo, xo.reshape(-1), interior_off, rp.lengths, rs, rd,
                R_ext, jnp.float32,
            )
            return (xo * 0.999999
                    + jnp.sum(x_ext, axis=1, keepdims=True) * 1e-12)
    else:
        step_halo = step_halo_gather

    t_halo_full = _chain_time(_make_chain(step_halo), xo0, reps=200)
    t_halo_base = _chain_time(_make_chain(step_halo_noop), xo0, reps=200)
    t_halo = max(t_halo_full - t_halo_base, 1e-12)
    t_hg_full = _chain_time(_make_chain(step_halo_gather), xo0, reps=200)
    t_hg = max(t_hg_full - t_halo_base, 1e-12)
    # TRUE moved elements: H is padded to row_pad_multiple and padded slots
    # point at the scratch column (slot == R_ext) — they move nothing, so
    # counting S*H would overstate the throughput by the padding fraction
    halo_elems = int((dec.halo_slots < R_ext).sum())
    halo_elems_per_s = halo_elems / t_halo
    halo_gather_elems_per_s = halo_elems / t_hg
    halo_sol = hbm_gbps / 8.0   # value read + value write per element
    halo_vs_roofline = min(halo_elems_per_s / halo_sol, 1.0)

    # headline first: a timeout during the informational RAS section must not
    # cost the driver its JSON line
    print(
        json.dumps(
            {
                "metric": "local_spmv_nnz_per_s_per_chip",
                "value": nnz_per_s,
                "unit": "nnz/s",
                "vs_baseline": vs_baseline,
                "trisolve_nnz_per_s": trisolve_elems_per_s,
                "trisolve_vs_roofline": trisolve_vs_roofline,
                "trisolve_block": blk,
                "trisolve_xla_elems_per_s": trisolve_xla_elems_per_s,
                "direct_inverse_elems_per_s": inverse_elems_per_s,
                "direct_inverse_vs_roofline": inverse_vs_roofline,
                "halo_gather_scatter_elems_per_s": halo_elems_per_s,
                "halo_vs_roofline": halo_vs_roofline,
                "halo_runs_path": rp is not None,
                "halo_elementwise_gather_elems_per_s": halo_gather_elems_per_s,
            }
        ),
        flush=True,
    )

    # ---- native RDMA compile check at D=1 (round-1 verdict weak #4) --------
    def rdma_native_check():
        from jax.sharding import PartitionSpec as P

        from schwarz_tpu.parallel.mesh import SUBD_AXIS, make_mesh
        from schwarz_tpu.parallel.neighbor_exchange import _rdma_cyclic_shift

        mesh1 = make_mesh(jax.devices()[:1])

        def fn(buf):
            # offset 1 mod 1 device = self-push: exercises the
            # make_async_remote_copy kernel natively on hardware
            return _rdma_cyclic_shift(
                buf, 1, 1, SUBD_AXIS, collective_id=0,
                interpret=not on_tpu,
            )

        mapped = jax.jit(jax.shard_map(
            fn, mesh=mesh1, in_specs=(P(),), out_specs=P(),
            check_vma=False,
        ))
        buf = jnp.arange(1024, dtype=jnp.float32)
        out = np.asarray(jax.block_until_ready(mapped(buf)))
        ok = bool(np.array_equal(out, np.arange(1024, dtype=np.float32)))
        return {"rdma_native_ok": ok, "rdma_native_mode":
                ("tpu" if on_tpu else "interpret")}

    try:
        rdma_info = rdma_native_check()
    except Exception as e:  # pragma: no cover
        rdma_info = {"rdma_native_ok": False, "rdma_native_error": str(e)[:200]}

    # free-running async kernel: native compile+execute proof of the FULL
    # 8-subdomain solve on one chip (Sl = 8 batching; the self-ring runs
    # the real DMA/semaphore/ack protocol and the folded-window compute)
    def async_native_check():
        from schwarz_tpu.ops.async_ras import AsyncRASolver

        A_a = laplacian_2d(32)
        b_a = generate_rhs(A_a.n, random=False)
        s_a = AsyncRASolver(A_a, b_a, num_subdomains=8, overlap=2,
                            tolerance=1e-4, staleness=1, ninner=10,
                            chunk_rounds=6, interpret=not on_tpu)
        _, info = s_a.run(max_rounds=120)
        # iterative-refinement restarts: same compiled kernel (only the b
        # input changes), so this proves the f64-accurate free-running
        # path natively at zero extra compile cost
        _, rinfo = s_a.run_refined(tol=1e-9, max_rounds=120)
        # two-level asynchronous Schwarz: spectral coarse corrections at
        # the restarts (host side; same compiled kernel)
        _, cinfo = s_a.run_refined(tol=1e-9, max_rounds=120, coarse_q=4)
        # O-RAS Robin transmission inside the kernel (preconditioner form):
        # same problem, boosted correction solves — fewer detection rounds
        s_o = AsyncRASolver(A_a, b_a, num_subdomains=8, overlap=2,
                            tolerance=1e-4, staleness=1, ninner=10,
                            chunk_rounds=6, interpret=not on_tpu,
                            oras_weight=-0.8)
        _, oinfo = s_o.run(max_rounds=240)
        # non-symmetric advection through the free-running kernel
        # (in-kernel Jacobi-BiCGStab correction solves)
        from schwarz_tpu.models.fem import advection_diffusion_2d

        A_n = advection_diffusion_2d(32)
        b_n = generate_rhs(A_n.n, random=False)
        s_n = AsyncRASolver(A_n, b_n, num_subdomains=8, overlap=2,
                            tolerance=1e-4, staleness=1, ninner=10,
                            chunk_rounds=6, interpret=not on_tpu,
                            nonsym=True)
        _, ninfo = s_n.run(max_rounds=400)
        return {"async_native_ok": bool(info["converged"]),
                "async_rel": info["relative_residual_norm"],
                "async_refined_ok": bool(rinfo["converged"]),
                "async_refined_rel": rinfo["relative_residual_norm"],
                "async_refined_restarts": rinfo["restarts"],
                "async_coarse_ok": bool(cinfo["converged"]),
                "async_coarse_rounds": int(cinfo["rounds"]),
                "async_onelevel_rounds": int(rinfo["rounds"]),
                "async_oras_ok": bool(oinfo["converged"]),
                "async_oras_rounds": int(oinfo["rounds"]),
                "async_nonsym_ok": bool(ninfo["converged"]),
                "async_nonsym_rel": ninfo["relative_residual_norm"],
                "async_native_sl": s_a.Sl,
                "async_native_mode": "tpu" if on_tpu else "interpret"}

    try:
        async_info = async_native_check()
    except Exception as e:  # pragma: no cover
        async_info = {"async_native_ok": False,
                      "async_native_error": str(e)[:200]}
    rdma_info.update(async_info)

    # 2-D free-running kernel: native proof of the 4-neighbor protocol —
    # the whole 2x2 block grid folds onto one chip ((ply, plx) window
    # batching), running the real DMA rings + in-VMEM intra-device halos
    def async2d_native_check():
        from schwarz_tpu.ops.async_ras_2d import AsyncRASolver2D
        from schwarz_tpu.parallel.mesh import make_mesh

        A_a = laplacian_2d(128)
        b_a = generate_rhs(A_a.n, random=False)
        s_a = AsyncRASolver2D(A_a, b_a, px=2, py=2, tolerance=2e-3,
                              staleness=1, ninner=30, chunk_rounds=20,
                              mesh=make_mesh(jax.devices()[:1]),
                              interpret=not on_tpu)
        _, info = s_a.run(max_rounds=200)
        return {"async2d_native_ok": bool(info["converged"]),
                "async2d_rel": info["relative_residual_norm"],
                "async2d_fold": [s_a.ply, s_a.plx],
                "async2d_native_mode": "tpu" if on_tpu else "interpret"}

    try:
        rdma_info.update(async2d_native_check())
    except Exception as e:  # pragma: no cover
        rdma_info.update({"async2d_native_ok": False,
                          "async2d_native_error": str(e)[:200]})

    # ---- secondary: RAS time-to-solution, paper-campaign two-stage config --
    # informational (stderr only): skipped when the compile budget is half-spent
    def run_ras_secondary():
        n1d_ras = 128 if on_tpu else 64
        A2 = laplacian_2d(n1d_ras)
        b2 = generate_rhs(A2.n)
        from schwarz_tpu.config import Partition

        s2 = Settings(
            partition=Partition.regular2d,   # 4x4 blocks, not thin strips
            # flagship-style mixed precision: f64 outer residuals with f32
            # inner solves (iterative refinement) at the reference's own
            # campaign tolerance (run_script:35-44 runs 1e-6).  Pure-f32
            # outer loops floor near 1.9e-4 relative under the spectral
            # coarse space (the strong correction amplifies f32 rounding;
            # measured identically on CPU and v5e), so the production
            # recipe — not a looser tolerance — is what the bench runs.
            overlap=6, tolerance=1e-6, max_iters=500, dtype="float64",
            local_compute_dtype="float32",
            local_tolerance=1e-6,
            # capped inexact local solves — the reference's own paper campaign
            # runs two-stage with liter=70 / ltol=0.1 (run_script:35-44);
            # measured sweep here: cap 20 gives 0.96 s vs 2.6 s uncapped at
            # identical final residual (BENCHMARKING.md)
            local_max_iters=20,
            precond=Precond.block_jacobi, block_jacobi_block_size=32,
            row_pad_multiple=128, two_level=True,
            # spectral (Neumann-block eigenvector) coarse space, 16 DOFs
            # per subdomain: measured 117 -> 15 outer iterations vs the
            # equal-size aggregate space at this config (BENCHMARKING.md);
            # the 1M-row/1e-8 flagship record (6.6 s one-chip) runs the
            # same construction at q=64
            coarse_aggregates=16, coarse_space="spectral",
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
                "spmv_us": t_spmv * 1e6,
                "spmv_chain_overhead_us": t_base * 1e6,
                "trisolve_us": t_tri * 1e6,
                "inverse_apply_us": t_inv * 1e6,
                "tri_rows": R_fac,
                "halo_us": t_halo * 1e6,
                "halo_elems": halo_elems,
                **rdma_info,
                **ras_info,
            }
        ),
        file=sys.stderr,
    )


def _backend_healthy(timeout_s: int = 300) -> bool:
    """Probe the (possibly tunneled) default backend in a child process.

    The axon TPU tunnel can be unreachable; backend init then HANGS for
    ~30 minutes before raising.  A quick probe lets the bench fall back to
    an honest CPU measurement (labeled by its ``device`` field) instead of
    burning the whole budget on a dead tunnel.
    """
    try:
        proc = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            capture_output=True, timeout=timeout_s,
        )
        return proc.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def guarded():
    """Run the measurement in a child with a timeout; fall back to --small."""
    env = None
    if not _backend_healthy():
        print("default backend unreachable; falling back to CPU",
              file=sys.stderr)
        env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    for args in ([], ["--small"]):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--inner", *args],
                capture_output=True, text=True, timeout=INNER_TIMEOUT_S,
                env=env,
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
        # salvage any run whose first stdout line is valid headline JSON —
        # the informational sections after it may die (watchdog, OOM)
        # without invalidating the completed measurement
        if lines:
            try:
                parsed = json.loads(lines[0])
                if parsed.get("metric"):
                    print(lines[0])
                    return 0
            except (json.JSONDecodeError, AttributeError):
                pass
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
