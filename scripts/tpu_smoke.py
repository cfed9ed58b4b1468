#!/usr/bin/env python
"""Native TPU smoke: compile + execute EVERY Pallas kernel on the real chip.

The round-3 lesson: interpret-mode tests cannot catch Mosaic legality
failures, so every kernel needs a native proof that runs in minutes, not a
full bench.  This script executes each kernel once at small-but-native
shapes and prints one PASS/FAIL line per kernel (exit 1 if any fail).

Run on hardware (default env):  python scripts/tpu_smoke.py
Budget: ~2 min after compile cache warmup (first run compiles, ~5-8 min).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    import jax.numpy as jnp

    from schwarz_tpu import Settings, generate_rhs, laplacian_2d
    from schwarz_tpu.core.decompose import decompose

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    print(f"device: {dev} (native={'yes' if on_tpu else 'NO — interpret'})",
          flush=True)
    failures = []

    def check(name, fn):
        t0 = time.time()
        try:
            fn()
            print(f"PASS  {name:28s} ({time.time()-t0:.1f}s)", flush=True)
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name:28s} {type(e).__name__}: {str(e)[:160]}",
                  flush=True)

    # --- DIA SpMV kernels (both generations) ------------------------------
    rng = np.random.default_rng(0)
    S, K, R, M = 4, 5, 2048, 128
    offsets = (-128, -1, 0, 1, 128)
    dia = jnp.asarray(rng.standard_normal((S, K, R)), jnp.float32)
    x_in = rng.standard_normal((S, R)).astype(np.float32)
    # margins must be ZERO: the kernels read them raw, the oracle re-pads
    xpad = jnp.asarray(np.pad(x_in, ((0, 0), (M, M))))

    def spmv_gen(kern):
        def run():
            from schwarz_tpu.ops.dia import dia_spmv

            y = np.asarray(jax.block_until_ready(
                kern(offsets, dia, xpad, interpret=not on_tpu)))
            yref = np.asarray(dia_spmv(offsets, dia, jnp.asarray(x_in)))
            assert np.allclose(y, yref, atol=1e-4), "mismatch"
        return run

    from schwarz_tpu.ops.pallas_kernels import (
        dia_spmv_pallas2d,
        dia_spmv_pallas3,
    )

    check("dia_spmv_pallas2d", spmv_gen(dia_spmv_pallas2d))
    check("dia_spmv_pallas3", spmv_gen(dia_spmv_pallas3))

    # --- fused halo assembly ----------------------------------------------
    def halo_fused():
        from schwarz_tpu.ops.halo_pallas import (
            assemble_x_ext_fused,
            build_tiled_plan,
        )
        from schwarz_tpu.parallel.exchange import (
            assemble_x_ext_runs,
            build_run_plan,
        )

        A = laplacian_2d(1024)
        b = generate_rhs(A.n, random=False)
        dec = decompose(A, b, Settings(overlap=3, dtype="float32",
                                       row_pad_multiple=1024), 16)
        R_int, R_ext = dec.meta.max_interior, dec.meta.max_ext
        rp = build_run_plan(dec.halo_src_halo, dec.halo_slots, R_ext, R_int,
                            dec.interior_offset)
        tp = build_tiled_plan(rp, dec.interior_offset, R_int, R_ext, 16,
                              tile=(1024 if on_tpu else 128))
        assert tp is not None
        xo = jnp.asarray(rng.standard_normal((16, R_int)), jnp.float32)
        off = jnp.asarray(dec.interior_offset.astype(np.int32))
        tables = tuple(jnp.asarray(t[c]) for c in range(len(tp.lengths_t))
                       for t in (tp.src_t, tp.dst_t))
        got = np.asarray(jax.block_until_ready(assemble_x_ext_fused(
            xo, xo.reshape(-1), off, tp, tables, interpret=not on_tpu)))
        ref = np.asarray(assemble_x_ext_runs(
            xo, xo.reshape(-1), off, rp.lengths,
            tuple(jnp.asarray(t) for t in rp.run_src),
            tuple(jnp.asarray(t) for t in rp.run_dst), R_ext, jnp.float32))
        assert np.array_equal(got, ref), "fused != runs path"

    check("halo_fused_assembly", halo_fused)

    # --- fused CG ----------------------------------------------------------
    def fused_cg():
        from schwarz_tpu.ops.fused_cg import fused_cg_solve

        offs = (-128, -1, 0, 1, 128)
        Rr = 1024
        # diagonally dominant SPD operator (the flat shifts wrap, so a
        # pure Laplacian stencil would be the singular periodic one)
        diag = np.full((2, Rr), 4.5, np.float32)
        dvals = np.stack([np.full((2, Rr), -1.0, np.float32)] * 2
                         + [diag]
                         + [np.full((2, Rr), -1.0, np.float32)] * 2, axis=1)
        rhs = jnp.asarray(rng.standard_normal((2, Rr)), jnp.float32)
        res = fused_cg_solve(offs, jnp.asarray(dvals), rhs,
                             jnp.zeros_like(rhs), None, 1e-6,
                             jnp.int32(60), has_dinv=False,
                             interpret=not on_tpu)
        jax.block_until_ready(res.x)
        assert bool((res.rel_resnorm < 1e-3).all()), (
            f"CG did not reduce: {res.rel_resnorm}")

    check("fused_cg", fused_cg)

    # --- RDMA cyclic shift (D=1 self-ring) ---------------------------------
    def rdma():
        from jax.sharding import PartitionSpec as P

        from schwarz_tpu.parallel.mesh import SUBD_AXIS, make_mesh
        from schwarz_tpu.parallel.neighbor_exchange import _rdma_cyclic_shift

        mesh1 = make_mesh(jax.devices()[:1])
        mapped = jax.jit(jax.shard_map(
            lambda buf: _rdma_cyclic_shift(buf, 1, 1, SUBD_AXIS,
                                           collective_id=0,
                                           interpret=not on_tpu),
            mesh=mesh1, in_specs=(P(),), out_specs=P(), check_vma=False))
        buf = jnp.arange(1024, dtype=jnp.float32)
        out = np.asarray(jax.block_until_ready(mapped(buf)))
        assert np.array_equal(out, np.arange(1024, dtype=np.float32))

    check("rdma_cyclic_shift", rdma)

    # --- free-running async kernels (1-D, 2-D, general) --------------------
    def async_1d():
        from schwarz_tpu.ops.async_ras import AsyncRASolver

        A = laplacian_2d(32)
        b = generate_rhs(A.n, random=False)
        s = AsyncRASolver(A, b, num_subdomains=8, overlap=2, tolerance=1e-3,
                          staleness=1, ninner=10, chunk_rounds=6,
                          interpret=not on_tpu)
        _, info = s.run(max_rounds=60)
        assert info["converged"], info

    check("async_ras_1d", async_1d)

    def async_1d_gmres():
        from schwarz_tpu.models.fem import advection_diffusion_2d
        from schwarz_tpu.ops.async_ras import AsyncRASolver

        A = advection_diffusion_2d(32)
        b = generate_rhs(A.n, random=False)
        # small m keeps the unrolled Arnoldi trace (O(m^2) scalar ops per
        # round) within the smoke's compile budget
        s = AsyncRASolver(A, b, num_subdomains=8, overlap=2, tolerance=1e-3,
                          staleness=1, ninner=6, chunk_rounds=4,
                          interpret=not on_tpu, nonsym=True,
                          nonsym_solver="gmres")
        _, info = s.run(max_rounds=160)
        assert info["converged"], info

    check("async_ras_1d_gmres", async_1d_gmres)

    def async_2d():
        from schwarz_tpu.ops.async_ras_2d import AsyncRASolver2D
        from schwarz_tpu.parallel.mesh import make_mesh

        A = laplacian_2d(128)
        b = generate_rhs(A.n, random=False)
        s = AsyncRASolver2D(A, b, px=2, py=2, tolerance=5e-3, staleness=1,
                            ninner=30, chunk_rounds=20,
                            mesh=make_mesh(jax.devices()[:1]),
                            interpret=not on_tpu)
        _, info = s.run(max_rounds=120)
        assert info["converged"], info

    check("async_ras_2d", async_2d)

    def async_general():
        from schwarz_tpu.config import Partition, Settings as _S
        from schwarz_tpu.core.partition import make_partition
        from schwarz_tpu.ops.async_ras_general import AsyncGeneralRASolver
        from schwarz_tpu.parallel.mesh import make_mesh

        # small instance so mxu_precision='auto' engages the f32-accurate
        # A-dots; accuracy via refinement restarts (the native bf16 story
        # is documented on the kernel)
        A = laplacian_2d(24)
        b = generate_rhs(A.n, random=False)
        part = make_partition(A, 4, _S(partition=Partition.metis))
        s = AsyncGeneralRASolver(
            A, b, num_subdomains=4, overlap=2, tolerance=0.1,
            staleness=1, ninner=24, chunk_rounds=8, part=part,
            mesh=make_mesh(jax.devices()[:1]), interpret=not on_tpu)
        _, info = s.run_refined(tol=1e-4, max_restarts=20, max_rounds=64)
        assert info["converged"], info

    check("async_ras_general", async_general)

    print(("ALL PASS" if not failures else f"FAILURES: {failures}"),
          flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
