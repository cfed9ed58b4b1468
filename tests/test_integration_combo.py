"""Kitchen-sink integration: METIS partition + RDMA transport + tree detection
+ mixed-precision halos + block-Jacobi CG + two subdomains per device +
two-level coarse correction, all at once."""

import jax
import numpy as np

from schwarz_tpu import (
    CommSettings,
    GlobalConvergence,
    HaloStrategy,
    Partition,
    Settings,
    generate_rhs,
    laplacian_2d,
)
from schwarz_tpu.config import ConvergenceSettings, Precond
from schwarz_tpu.core.decompose import decompose
from schwarz_tpu.parallel.mesh import make_mesh
from schwarz_tpu.ras import RASolver


def test_everything_at_once():
    A = laplacian_2d(20)
    b = generate_rhs(A.n)
    s = Settings(
        partition=Partition.metis,
        overlap=3,
        tolerance=1e-5,            # above the f32-halo residual floor
        max_iters=400,
        halo_dtype="float32",
        precond=Precond.block_jacobi,
        block_jacobi_block_size=8,
        two_level=True,
        comm=CommSettings(strategy=HaloStrategy.rdma),
        convergence=ConvergenceSettings(method=GlobalConvergence.tree),
    )
    dec = decompose(A, b, s, 8)
    mesh = make_mesh(jax.devices()[:4])   # Sl = 2
    r = RASolver(dec, mesh=mesh).run()
    assert r.converged, (r.iters, r.relative_residual_norm)
    assert r.relative_residual_norm < 1e-3
    import scipy.sparse.linalg as spla

    x_direct = spla.spsolve(A.to_scipy().tocsc(), b)
    np.testing.assert_allclose(
        r.solution, x_direct,
        rtol=1e-3, atol=1e-4 * np.abs(x_direct).max(),
    )
