"""Fused Pallas x_ext assembly (ops/halo_pallas.py) vs the XLA paths.

The kernel must be bit-identical to assemble_x_ext / assemble_x_ext_runs on
real decompositions.  On hardware the DMA tile is 1024 elements (one f32
(8, 128) tile — Mosaic's slicing granularity, the round-3 lesson); under the
CPU interpreter the same code runs with tile=128 so ordinary unit-test-sized
decompositions exercise the exact production code path.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from schwarz_tpu import Settings, generate_rhs, laplacian_2d
from schwarz_tpu.core.decompose import decompose
from schwarz_tpu.ops.halo_pallas import (
    assemble_x_ext_fused,
    build_tiled_plan,
    fused_assemble_supported,
)
from schwarz_tpu.parallel.exchange import (
    assemble_x_ext,
    build_run_plan,
)


def _decomp(n1d=128, S=4, overlap=2):
    A = laplacian_2d(n1d)
    b = generate_rhs(A.n, random=False)
    return decompose(A, b, Settings(overlap=overlap, dtype="float32",
                                    row_pad_multiple=128), S)


def _plans(dec, tile=128):
    r_ext = dec.meta.max_ext
    r_int = dec.meta.max_interior
    rp = build_run_plan(dec.halo_src_halo, dec.halo_slots, r_ext, r_int,
                        dec.interior_offset)
    assert rp is not None, "regular 1-D partitions must yield a run plan"
    tp = build_tiled_plan(rp, dec.interior_offset, r_int, r_ext,
                          dec.meta.num_subdomains, tile=tile)
    return rp, tp


def _tables(tp):
    return tuple(
        jnp.asarray(t[c])
        for c in range(len(tp.lengths_t))
        for t in (tp.src_t, tp.dst_t)
    )


@pytest.mark.parametrize("n1d,S,overlap", [(128, 4, 2), (128, 8, 3)])
def test_fused_matches_gather_path(rng, n1d, S, overlap):
    dec = _decomp(n1d, S, overlap)
    r_ext = dec.meta.max_ext
    r_int = dec.meta.max_interior
    rp, tp = _plans(dec)
    assert tp is not None, "n1d=128 strip decompositions are 128-aligned"
    assert fused_assemble_supported(tp, jnp.float32)

    x_own = jnp.asarray(
        rng.standard_normal((S, r_int)).astype(np.float32)
    )
    x_all_flat = x_own.reshape(-1)
    interior_off = jnp.asarray(dec.interior_offset.astype(np.int32))

    halo_vals = x_all_flat[jnp.asarray(dec.halo_src_halo)]
    ref = assemble_x_ext(
        x_own, interior_off, jnp.asarray(dec.halo_slots), halo_vals, r_ext
    )
    fused = assemble_x_ext_fused(
        x_own, x_all_flat, interior_off, tp, _tables(tp), interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(fused), np.asarray(ref))


def test_fused_zero_pads_uncovered_slots(rng):
    # padded ext slots (between the last valid slot and max_ext) must come
    # out exactly zero — downstream padded-row matrix entries multiply them
    dec = _decomp(128, 4, 2)
    r_ext = dec.meta.max_ext
    r_int = dec.meta.max_interior
    rp, tp = _plans(dec)
    x_own = jnp.asarray(np.full((4, r_int), 7.0, np.float32))
    fused = np.asarray(assemble_x_ext_fused(
        x_own, x_own.reshape(-1),
        jnp.asarray(dec.interior_offset.astype(np.int32)),
        tp, _tables(tp), interpret=True,
    ))
    covered = np.zeros((4, r_ext), bool)
    for s in range(4):
        o = int(dec.interior_offset[s])
        covered[s, o:o + r_int] = True
    for L, ts, td in zip(rp.lengths, rp.run_src, rp.run_dst):
        for s in range(4):
            for d0 in td[s]:
                if d0 < r_ext:
                    covered[s, d0:d0 + L] = True
    assert (fused[~covered] == 0.0).all()
    assert (fused[covered] == 7.0).all()


def test_tiled_plan_rejects_unaligned_layouts():
    # n1d=32 runs are 32-element multiples: not 128-tile-aligned -> no
    # tiled plan, and the solver must fall back (recording the reason)
    dec = _decomp(32, 4, 2)
    rp, tp = _plans(dec)
    assert tp is None
    assert not fused_assemble_supported(tp, jnp.float32)


def test_solver_records_fused_fallback_reason():
    from schwarz_tpu.ras import RASolver

    A = laplacian_2d(32)
    b = generate_rhs(A.n, random=False)
    s = Settings(overlap=2, dtype="float32", tolerance=1e-5,
                 max_iters=20, row_pad_multiple=128, halo_fused="on")
    solver = RASolver(decompose(A, b, s, 4))
    assert not solver._halo_fused
    assert "tile-aligned" in solver._halo_fused_reason


def test_solver_uses_fused_assembly_end_to_end(rng):
    # the production wire-up: RASolver with halo_fused='on' (interpret with
    # tile=128 on the CPU mesh) must produce the same iterates as the XLA
    # runs path
    from schwarz_tpu.ras import RASolver

    A = laplacian_2d(128)
    b = generate_rhs(A.n, random=False)
    base = Settings(overlap=2, dtype="float32", tolerance=1e-5,
                    max_iters=40, row_pad_multiple=128)
    r_ref = RASolver(decompose(A, b, base, 4)).run()
    s_fused = base.replace(halo_fused="on")
    solver = RASolver(decompose(A, b, s_fused, 4))
    assert solver._halo_fused, solver._halo_fused_reason
    r_fused = solver.run()
    assert r_fused.iters == r_ref.iters
    np.testing.assert_array_equal(r_fused.solution, r_ref.solution)
