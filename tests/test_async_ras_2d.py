"""2-D free-running asynchronous RAS (ops/async_ras_2d.py): 4-neighbor
block grids with two-hop corner coverage, run under the interpreter on the
8-device CPU mesh."""

import numpy as np
import pytest
import scipy.sparse.linalg as spla

from schwarz_tpu import generate_rhs, laplacian_2d
from schwarz_tpu.exceptions import NotImplementedFeature
from schwarz_tpu.ops.async_ras_2d import (
    AsyncRASolver2D,
    build_async_plan_2d,
)


# whole-module slow tier: multi-minute free-running solves
pytestmark = pytest.mark.slow


def test_async_2d_converges_with_unequal_detection():
    # 4x2 block grid over 8 devices: the full protocol (4-direction slot
    # rings, ack flow control, two-hop corners, in-band gossip) must drive
    # the 256^2 Poisson system to the fixed point, with per-device
    # detection iterations genuinely unequal
    A = laplacian_2d(256)
    b = generate_rhs(A.n, random=False)
    s = AsyncRASolver2D(A, b, px=4, py=2, tolerance=2e-3, staleness=1,
                        ninner=30, chunk_rounds=20)
    x, info = s.run(max_rounds=400)
    assert info["converged"], info
    assert info["relative_residual_norm"] < 1e-2
    assert len(np.unique(info["done_at"])) > 1, info["done_at"]
    x_ref = spla.spsolve(A.to_scipy().tocsc(), b)
    err = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
    assert err < 5e-3, err


def test_async_2d_converges_anisotropic_9pt():
    # 9-point stencil (diagonal couplings): corner data arrives two-hop,
    # the free-running iteration must still reach the fixed point
    from schwarz_tpu.models import anisotropic_diffusion_2d

    A = anisotropic_diffusion_2d(128, eps=5.0, theta=0.4)
    b = generate_rhs(A.n, random=False)
    s = AsyncRASolver2D(A, b, px=4, py=2, tolerance=2e-3, staleness=1,
                        ninner=40, chunk_rounds=20)
    x, info = s.run(max_rounds=600)
    assert info["converged"], info
    x_ref = spla.spsolve(A.to_scipy().tocsc(), b)
    err = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
    assert err < 2e-2, err


def test_async_2d_oras_converges_not_slower():
    # O-RAS Robin diagonal on the in-kernel correction CG (same fixed
    # point — the residual keeps the true A); comparative assertion only
    A = laplacian_2d(64)
    b = generate_rhs(A.n, random=False)
    x_ref = spla.spsolve(A.to_scipy().tocsc(), b)

    def run(c):
        s = AsyncRASolver2D(A, b, px=2, py=4, tolerance=1e-4, staleness=1,
                            ninner=12, chunk_rounds=8, oras_weight=c)
        x, info = s.run(max_rounds=400)
        assert info["converged"], (c, info)
        err = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
        assert err < 1e-2, (c, err)
        return info["rounds"]

    assert run(-0.8) <= run(0.0)


def test_async_2d_fresh_read_converges_and_never_slower():
    """fresh_read on the 2-D kernel: per-direction DMA-semaphore peeks
    consume the freshest fully-arrived strips; fixed point unchanged,
    detection not slower at staleness 3 (cf. the 1-D test)."""
    A = laplacian_2d(256)
    b = generate_rhs(A.n, random=False)

    def run(fresh):
        s = AsyncRASolver2D(A, b, px=4, py=2, tolerance=2e-3, staleness=2,
                            ninner=30, chunk_rounds=20, fresh_read=fresh)
        x, info = s.run(max_rounds=800)
        assert info["converged"], info
        x_ref = spla.spsolve(A.to_scipy().tocsc(), b)
        err = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
        assert err < 5e-3, err
        if fresh:
            assert info["fresh_read_hits"] > 0, info
        else:
            assert info["fresh_read_hits"] == 0, info
        return int(np.max(info["done_at"]))

    assert run(True) <= run(False)


def test_async_2d_block_batching():
    # 4x4 block grid folded onto 4 devices (2x2 device grid, 2x2 windows
    # per device): intra-device halos refresh in VMEM each iteration, only
    # device-edge strips ride the DMA rings
    import jax

    from schwarz_tpu.parallel.mesh import make_mesh

    A = laplacian_2d(256)
    b = generate_rhs(A.n, random=False)
    mesh = make_mesh(jax.devices()[:4])
    s = AsyncRASolver2D(A, b, px=4, py=4, tolerance=2e-3, staleness=1,
                        ninner=30, chunk_rounds=20, mesh=mesh)
    assert (s.pdy, s.pdx, s.ply, s.plx) == (2, 2, 2, 2)
    x, info = s.run(max_rounds=400)
    assert info["converged"], info
    assert info["device_grid"] == (2, 2)
    x_ref = spla.spsolve(A.to_scipy().tocsc(), b)
    err = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
    assert err < 5e-3, err


def test_async_2d_single_device_fold():
    # the whole 2x2 block solve folded on ONE device — the native
    # single-chip mode the TPU bench exercises
    import jax

    from schwarz_tpu.parallel.mesh import make_mesh

    A = laplacian_2d(128)
    b = generate_rhs(A.n, random=False)
    mesh = make_mesh(jax.devices()[:1])
    s = AsyncRASolver2D(A, b, px=2, py=2, tolerance=2e-3, staleness=1,
                        ninner=30, chunk_rounds=20, mesh=mesh)
    assert (s.ply, s.plx) == (2, 2)
    x, info = s.run(max_rounds=400)
    assert info["converged"], info
    x_ref = spla.spsolve(A.to_scipy().tocsc(), b)
    err = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
    assert err < 5e-3, err


def test_async_2d_plan_gates_fail_loudly():
    import scipy.sparse as sp

    from schwarz_tpu.models import CSRMatrix

    # bandwidth-2 couplings are outside any grid stencil
    m = sp.diags([1.0, -4.0, 1.0], [-2, 0, 2],
                 shape=(16, 16), format="csr")
    with pytest.raises(NotImplementedFeature, match="9-point"):
        build_async_plan_2d(CSRMatrix.from_scipy(m.tocsr()), np.ones(16),
                            2, 2)
    # non-square size
    m = sp.eye(12).tocsr()
    with pytest.raises(NotImplementedFeature, match="square"):
        build_async_plan_2d(CSRMatrix.from_scipy(m), np.ones(12), 2, 2)


def _aniso_64():
    from schwarz_tpu.models import anisotropic_diffusion_2d

    return anisotropic_diffusion_2d(64, eps=5.0, theta=0.3)


@pytest.mark.parametrize("gen", [laplacian_2d, _aniso_64],
                         ids=["5pt", "9pt"])
def test_async_2d_plan_invariants(gen):
    # the extended-block stencil must reproduce the exact residual: for the
    # direct solution, the masked residual on every device domain is ~0
    A = gen(64) if gen is laplacian_2d else gen()
    b = generate_rhs(A.n, random=False)
    p = build_async_plan_2d(A, b, 2, 2)
    x_ref = spla.spsolve(A.to_scipy().tocsc(), b)
    xg = np.zeros((p.py * p.by, p.px * p.bx))
    xg[:p.n, :p.n] = x_ref.reshape(p.n, p.n)
    from schwarz_tpu.ops.async_ras_2d import HX, HY

    for d in range(p.S):
        dyy, dxx = divmod(d, p.px)
        y0, x0 = dyy * p.by, dxx * p.bx
        X = np.zeros((p.By, p.Bx))
        ys, xs = y0 - HY, x0 - HX
        gy0, gy1 = max(ys, 0), min(ys + p.By, p.py * p.by)
        gx0, gx1 = max(xs, 0), min(xs + p.Bx, p.px * p.bx)
        X[gy0 - ys:gy1 - ys, gx0 - xs:gx1 - xs] = xg[gy0:gy1, gx0:gx1]
        y = (p.coef[d, 0] * X
             + p.coef[d, 1] * np.roll(X, -1, 1)
             + p.coef[d, 2] * np.roll(X, 1, 1)
             + p.coef[d, 3] * np.roll(X, -1, 0)
             + p.coef[d, 4] * np.roll(X, 1, 0)
             + p.coef[d, 5] * np.roll(np.roll(X, -1, 0), -1, 1)
             + p.coef[d, 6] * np.roll(np.roll(X, -1, 0), 1, 1)
             + p.coef[d, 7] * np.roll(np.roll(X, 1, 0), -1, 1)
             + p.coef[d, 8] * np.roll(np.roll(X, 1, 0), 1, 1))
        r = p.mask_dom[d] * (p.b[d] - y)
        # tolerance is relative to the stencil-product scale: f32 coef
        # rounding leaves ~eps_f32 * |coef|*|x| per cell
        scale = max(
            1.0,
            float(np.linalg.norm(p.mask_dom[d] * np.abs(p.coef[d]).sum(0)
                                 * np.abs(X))),
        )
        assert np.linalg.norm(r) / scale < 1e-5, (d, np.linalg.norm(r))
    # owned masks tile the true grid exactly once
    cover = np.zeros((p.py * p.by, p.px * p.bx))
    for d in range(p.S):
        dyy, dxx = divmod(d, p.px)
        cover[dyy * p.by:(dyy + 1) * p.by,
              dxx * p.bx:(dxx + 1) * p.bx] += (
            p.mask_int[d, HY:HY + p.by, HX:HX + p.bx]
        )
    assert np.all(cover[:p.n, :p.n] == 1.0)


def test_make_free_running_solver_dispatch():
    # the shared dispatch helper behind solve()/CLI: 2-D kernel for
    # square-grid stencils with composite S, 1-D banded otherwise,
    # general-graph for unstructured; refine flag below the f32 floor
    import scipy.sparse as sp

    from schwarz_tpu.config import Settings
    from schwarz_tpu.models.csr import CSRMatrix
    from schwarz_tpu.ops.async_ras import AsyncRASolver
    from schwarz_tpu.ops.async_ras_general import AsyncGeneralRASolver
    from schwarz_tpu.ras import make_free_running_solver

    A = laplacian_2d(32)
    b = generate_rhs(A.n, random=False)
    st = Settings(free_running=True, tolerance=1e-3, overlap=2)
    s, refine = make_free_running_solver(A, b, 4, st)
    assert isinstance(s, AsyncRASolver2D) and not refine

    # prime S cannot tile a block grid -> 1-D banded strips
    s, _ = make_free_running_solver(A, b, 5, st)
    assert isinstance(s, AsyncRASolver)

    # tridiagonal chain (not a 2-D grid) -> 1-D banded
    n = 600
    tri = CSRMatrix.from_scipy(sp.diags(
        [-np.ones(n - 1), 2.0 * np.ones(n), -np.ones(n - 1)],
        [-1, 0, 1]).tocsr())
    s, _ = make_free_running_solver(tri, np.ones(n), 4, st)
    assert isinstance(s, AsyncRASolver)

    # explicit partition -> general-graph kernel
    part = np.repeat(np.arange(4), A.n // 4)
    s, _ = make_free_running_solver(A, b, 4, st, partition_indices=part)
    assert isinstance(s, AsyncGeneralRASolver)

    # below the f32 floor -> refine
    _, refine = make_free_running_solver(
        A, b, 4, Settings(free_running=True, tolerance=1e-9, overlap=2)
    )
    assert refine


def test_async_2d_checkpoint_resume_matches_straight_run(tmp_path):
    A = laplacian_2d(64)
    b = generate_rhs(A.n, random=False)
    kw = dict(px=2, py=2, tolerance=1e-3, staleness=1, ninner=20,
              chunk_rounds=8)
    s_ref = AsyncRASolver2D(A, b, **kw)
    sol_ref, info_ref = s_ref.run(max_rounds=200)
    ck = str(tmp_path / "fr2d.npz")
    s1 = AsyncRASolver2D(A, b, **kw)
    s1.run(max_rounds=32, checkpoint_path=ck)
    s2 = AsyncRASolver2D(A, b, **kw)
    sol2, info2 = s2.run(max_rounds=200,
                         resume_state=s2.load_checkpoint(ck))
    # the uniform schedule is deterministic: resumed == straight run
    np.testing.assert_array_equal(sol_ref, sol2)
    np.testing.assert_array_equal(info_ref["done_at"], info2["done_at"])
